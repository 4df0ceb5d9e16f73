"""Datetime formatting quirks, reproduced exactly.

Two distinct behaviors exist in the reference and BOTH must be preserved
(SURVEY.md §2.7 F2/F3, §7.3 risk 3):

1. ``format_datetime_string`` — producer-side: ``"D H:M:S.ffffff"`` →
   ``"DTH:M:S.fff"`` (split on space and dot, keep the FIRST 3 fractional
   digits, join with "T")
   (/root/reference/data_collection/cve_collection.py:208-221, duplicated
   at /root/reference/process/shared_functions.py:67-80 and
   /root/reference/utilities.py:71-84).

2. ``repair_datetime_literal`` — post-hoc graph fixer: an ``xsd:dateTime``
   literal whose fractional part still has >3 digits gets the ENTIRE
   fractional part removed (``dateTime[:milliPos]``), despite the log line
   claiming 3-digit truncation
   (/root/reference/process/ontology_updater.py:7-30, fix at :19-23).
"""

from __future__ import annotations


def format_datetime_string(datetime_string: str) -> str:
    date_part, time_part = datetime_string.split(" ")
    seconds_part, milliseconds_part = time_part.split(".")
    return f"{date_part}T{seconds_part}.{milliseconds_part[:3]}"


def repair_datetime_literal(value: str) -> str:
    milli_pos = value.rfind(".")
    if milli_pos != -1 and len(value[milli_pos + 1 :]) > 3:
        return value[:milli_pos]
    return value


def date_midnight_suffix(date_str: str) -> str:
    """CWE ``Submission_Date`` + ``"T00:00:00"``
    (/root/reference/data_collection/cwe_collection.py:326-336)."""
    return date_str + "T00:00:00"
