"""Pure-Python shared kernels.

Imported by BOTH the Spark Arrow UDFs (operators/) and the single-threaded
oracle (oracle/). One implementation ⇒ byte-identical outputs by
construction — the same trick the reference plays by sharing
``format_datetime_string`` across three modules
(/root/reference/data_collection/cve_collection.py:208,
/root/reference/process/shared_functions.py:67,
/root/reference/utilities.py:71).

Nothing in this package may import pyspark, pandas, or numpy.
"""
