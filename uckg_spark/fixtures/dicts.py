"""Dictionary-table fixtures (broadcast dimensions), FIXTURES.md §2.

Shapes cite the reference structures they mirror:
- dict_cve  ≙ the per-CVE projection built at
  /root/reference/data_collection/cve_collection.py:427-446 — here kept in
  *pre-join* form (raw weakness values + raw configurations) so the
  pipeline itself exercises P6 membership and J1 dictionary-lookup.
- dict_cpe  ≙ SQLite ``cpe_data`` (cve_collection.py:85-92).
- dict_cwe  ≙ ``cwe_dict`` rows (cwe_collection.py:366-390).
- dict_attack entities ≙ parse_attack_file projection (parse.py:124);
  relationships ≙ parse_relationships_file (parse.py:237-242).
- dict_capec ≙ parse_capec_file projection (parse.py:272-431).
- dict_d3fend ≙ parse_d3fend_file (parse.py:84-106).
- alias_table — graft-only linking dimension (no reference analog; the
  reference links by exact id only, cve_collection.py:384-389).
"""

from __future__ import annotations

import random

SEED = 42

VENDORS = [
    "acmesoft", "globex", "initech", "umbrella", "vandelay",
    "hooli", "starkworks", "waynetech", "tyrell", "cyberdyne",
]
HOT_VENDORS = ["acmesoft", "globex"]

PRODUCTS = [
    "webgate", "dbcore", "mailflow", "netlock", "authhub",
    "fileray", "streamdock", "kvbolt", "querypad", "logsmith",
]

CWE_IDS = [
    "CWE-79", "CWE-89", "CWE-22", "CWE-287", "CWE-125", "CWE-416",
    "CWE-502", "CWE-798", "CWE-20", "CWE-352", "CWE-434", "CWE-611",
    "CWE-862", "CWE-306", "CWE-190", "CWE-1007", "CWE-918", "CWE-77",
    "CWE-476", "CWE-400",
]

TECHNIQUE_IDS = [
    "T1001", "T1002", "T1003", "T1003.001", "T1004", "T1005",
    "T1006", "T1007", "T1008",
]
TECHNIQUE_NAMES = {
    "T1001": "Relay Channel Obfuscation",
    "T1002": "Archive Staging Sweep",
    "T1003": "Credential Vault Dredging",
    "T1003.001": "Credential Vault Dredging: Memory Carve",
    "T1004": "Boot Hook Persistence",
    "T1005": "Local Trove Harvesting",
    "T1006": "Volume Shadow Walking",
    "T1007": "Service Census Probe",
    "T1008": "Backup Channel Fallback",
}

CAPEC_IDS = ["CAPEC-66", "CAPEC-7", "CAPEC-112", "CAPEC-242", "CAPEC-586",
             "CAPEC-63", "CAPEC-650", "CAPEC-88", "CAPEC-115", "CAPEC-94"]

# non-technique ATT&CK entity ids (id grammar per attack.mitre.org; one
# list per kind so fixture pages can mention them directly)
MITIGATION_IDS = [f"M{1000 + i}" for i in range(8)]
CAMPAIGN_IDS = [f"C{10 + i:04d}" for i in range(8)]
GROUP_IDS = [f"G{100 + i:04d}" for i in range(8)]
SOFTWARE_IDS = [f"S{500 + i:04d}" for i in range(8)]
TACTIC_IDS = [f"TA{40 + i:04d}" for i in range(8)]
ATTACK_OTHER_IDS = (
    MITIGATION_IDS + CAMPAIGN_IDS + GROUP_IDS + SOFTWARE_IDS + TACTIC_IDS
)
D3FEND_IDS = [f"D3-FX{i:02d}" for i in range(6)]

N_CVE = 50
HOT_CVES = ["CVE-2024-0001", "CVE-2024-0002", "CVE-2024-0003"]


def cve_ids() -> list[str]:
    return [f"CVE-2024-{i:04d}" for i in range(1, N_CVE + 1)]


def _cpe_name(vendor: str, product: str, version: str) -> str:
    # format: mapping/cve/cve_rml.ttl:155 / paper Table IV
    return f"cpe:2.3:a:{vendor}:{product}:{version}:*:*:*:*:*:*:*"


def dict_cpe() -> list[dict]:
    """~40 rows + one duplicate cpeName with different lastModified
    (upsert-determinism case, cve_collection.py:185-188)."""
    rng = random.Random(SEED)
    rows = []
    k = 0
    for vi, vendor in enumerate(VENDORS):
        for pi in range(4):
            product = PRODUCTS[(vi + pi) % len(PRODUCTS)]
            version = f"{1 + (k % 3)}.{k % 10}"
            name = _cpe_name(vendor, product, version)
            titles = [
                {"title": f"{vendor.capitalize()} {product.capitalize()} {version}",
                 "lang": "en"}
            ]
            if k % 7 == 0:
                titles.append(
                    {"title": f"{vendor.capitalize()} {product.capitalize()} {version} (ES)",
                     "lang": "es"})
            rows.append({
                "cpeName": name,
                "cpeNameId": f"{k:08X}-AAAA-BBBB-CCCC-{rng.randrange(16**12):012X}",
                # k%9==0 rows carry a >3-digit fraction: the F3 repair must
                # drop the ENTIRE fraction (ontology_updater.py:19-23 quirk)
                "lastModified": (
                    f"2024-02-{(k % 28) + 1:02d}T10:{k % 60:02d}:00.123456"
                    if k % 9 == 0
                    else f"2024-02-{(k % 28) + 1:02d}T10:{k % 60:02d}:00.000"
                ),
                "titles_json": __import__("json").dumps(titles),
            })
            k += 1
    # duplicate key, later lastModified — window-dedup must keep this one
    dup = dict(rows[0])
    dup["lastModified"] = "2024-03-01T00:00:00.000"
    dup["cpeNameId"] = "FFFFFFFF-AAAA-BBBB-CCCC-000000000001"
    rows.append(dup)
    return rows


def dict_cwe() -> list[dict]:
    """~20 rows; CWE-400 has every optional section None (P7 null-drop);
    observed_examples reference fixture CVE ids (cwe_rml.ttl:37-43)."""
    rows = []
    for i, cid in enumerate(CWE_IDS):
        num = cid.split("-")[1]
        all_none = cid == "CWE-400"
        obs = None
        if not all_none and i % 3 == 0:
            obs = {"observed_example": [
                {"cwe_id": cid, "Reference": f"CVE-2024-{(i % N_CVE) + 1:04d}",
                 "Description": f"Seen exploiting {cid} in the wild (fixture).",
                 "Link": f"https://fixture.test/obs/{num}"},
                {"cwe_id": cid, "Reference": f"CVE-2024-{((i + 7) % N_CVE) + 1:04d}",
                 "Description": f"Second sighting of {cid} (fixture).",
                 "Link": f"https://fixture.test/obs/{num}b"},
            ]}
        related = None
        if not all_none and i % 4 == 1:
            related = {"related_weakness": [
                {"ID": CWE_IDS[(i + 1) % len(CWE_IDS)].split("-")[1],
                 "Nature": "ChildOf", "View_ID": "1000", "Ordinal": "Primary"},
            ]}
        rows.append({
            "id_value": cid,
            "name": None if all_none else f"Fixture Weakness {num}",
            "abstraction": None if all_none else ("Base" if i % 2 else "Variant"),
            "structure": None if all_none else "Simple",
            "status": None if all_none else "Stable",
            "description": None if all_none else f"A fixture weakness class {cid} describing improper handling case {i}.",
            "extended_summary": None if all_none or i % 5 else f"Extended fixture notes for {cid}.",
            "related_weaknesses": related,
            "applicable_platforms": None if all_none else f"Languages: Class L{i % 3}",
            "modes_of_introduction": None if all_none or i % 2 else "PHASE:Implementation",
            "common_consequences": None if all_none else f"SCOPE:Integrity - IMPACT:Modify Data ({num})",
            "detection_methods": None if all_none or i % 3 else f"METHOD:Automated Static Analysis ({num})",
            "potential_mitigations": None if all_none else f"PHASE:Architecture - DESCRIPTION:Fixture mitigation {num}",
            "demonstrative_examples": None if all_none or i % 4 else f"Example snippet {num}",
            "observed_examples": obs,
            "references": None if all_none else f"REF-{num}",
            "mapping_notes": None if all_none or i % 6 else f"USAGE:Allowed ({num})",
            "time_of_introduction": None if all_none else f"2019-0{(i % 9) + 1}-15T00:00:00",
            "summary": None if all_none else f"A fixture weakness class {cid} describing improper handling case {i}.",
            "likelihood_of_exploit": None if all_none or i % 3 == 2 else "High",
            "related_attack_patterns": None if all_none or i % 5 else {
                "related_attack_pattern": [CAPEC_IDS[i % len(CAPEC_IDS)]]},
        })
    return rows


def dict_cve() -> list[dict]:
    """Pre-join CVE docs: raw weakness values (incl. non-CWE decoys the P6
    membership filter must drop) and raw configurations (the P9
    nodes[0].cpeMatch[0] shape). Timestamps carry the producer's
    " "-separated form so F2 formatting is exercised; a few carry >3
    fractional digits post-format to exercise the F3 repair."""
    rng = random.Random(SEED + 1)
    cpes = dict_cpe()
    cwes = CWE_IDS
    rows = []
    for i, cid in enumerate(cve_ids(), start=1):
        # weakness values: mostly real CWE ids, some decoys
        wvals = []
        for j in range((i % 4)):
            wvals.append(cwes[(i + j) % len(cwes)])
        if i % 5 == 0:
            wvals.append("NVD-CWE-Other")  # decoy: dropped by P6
        if i % 9 == 0:
            wvals.append(" " + cwes[i % len(cwes)] + " ")  # strip-check, emit-original quirk
        # configurations: list of configs; each config = nodes list; each
        # node = cpeMatch list of criteria. Only nodes[0].cpeMatch[0] counts.
        configs = []
        for j in range(i % 3):
            crit = cpes[(i * 3 + j) % (len(cpes) - 1)]["cpeName"]
            decoy = _cpe_name("ignoredvendor", "ignoredprod", "9.9")
            configs.append([[crit, decoy], [decoy]])  # nodes[1:] ignored (P9)
        if i % 11 == 0:
            configs.append([[ _cpe_name("ghostvendor", "ghostprod", "0.1") ]])  # dictionary_found=False path
        if i == 17:
            configs.append([])  # empty nodes -> IndexError -> P10 truncation
        descs = [{"lang": "en",
                  "value": f"Fixture vulnerability {cid} in {VENDORS[i % len(VENDORS)]} {PRODUCTS[i % len(PRODUCTS)]} allows case-{i} abuse."}]
        if i % 6 == 0:
            descs.append({"lang": "es", "value": f"Vulnerabilidad de prueba {cid} (caso {i})."})
        frac = "123456" if i % 13 == 0 else f"{(i * 37) % 1000:03d}"
        pub = f"2024-01-{(i % 28) + 1:02d} 08:{i % 60:02d}:15.{frac}"
        mod = f"2024-02-{(i % 28) + 1:02d} 18:{(i * 7) % 60:02d}:44.{frac}"
        has_cvss = i % 7 != 3
        rows.append({
            "id": cid,
            "published_raw": pub,
            "lastModified_raw": mod,
            "descriptions": descs,
            "vulnStatus": "Analyzed" if i % 2 else "Modified",
            "metrics_present": has_cvss,
            "vectorString": f"AV:N/AC:L/Au:N/C:{'C' if i % 2 else 'P'}/I:P/A:P" if has_cvss else "",
            "baseSeverity": ["LOW", "MEDIUM", "HIGH"][i % 3] if has_cvss else "",
            "exploitabilityScore": f"{(i % 10) + 0.5}" if has_cvss else "",
            "impactScore": f"{((i * 3) % 10) + 0.4}" if has_cvss else "",
            "obtainAllPrivilege": bool(i % 10 == 0) if has_cvss else False,
            "userInteractionRequired": bool(i % 4 == 0) if has_cvss else False,
            "weakness_values": wvals,
            "configurations": configs,
            "evaluatorSolution": f"Apply fixture patch {i}." if i % 8 == 0 else "",
        })
        rng.random()  # keep rng in the loop for future fixture evolution
    return rows


def dict_attack() -> tuple[list[dict], list[dict]]:
    """(entities, relationships). Entities follow parse.py:124; relationships
    follow parse.py:237-242 incl. a null source ID (drop, parse.py:231-234)
    and a dangling target ID (inner-join drop, attack_rml.ttl:267-271)."""
    ents = []
    for kind, ids in [
        ("technique", TECHNIQUE_IDS),
        ("mitigation", MITIGATION_IDS),
        ("campaign", CAMPAIGN_IDS),
        ("group", GROUP_IDS),
        ("software", SOFTWARE_IDS),
        ("tactic", TACTIC_IDS),
    ]:
        for j, eid in enumerate(ids):
            ents.append({
                "ID": eid,
                "name": TECHNIQUE_NAMES.get(eid, f"Fixture {kind} {eid}"),
                "description": f"Fixture description for {kind} {eid}.",
                "url": f"https://fixture.test/attack/{eid}",
                "domain": ["enterprise-attack", "mobile-attack", "ics-attack"][j % 3],
                "kind": kind,
            })
    rels = []
    pairs = [
        ("mitigation", "technique"), ("campaign", "group"),
        ("campaign", "software"), ("campaign", "technique"),
        ("group", "software"), ("group", "technique"),
        ("software", "technique"),
    ]
    by_kind: dict[str, list[str]] = {}
    for e in ents:
        by_kind.setdefault(e["kind"], []).append(e["ID"])
    for pi, (st, tt) in enumerate(pairs):
        for j in range(3):
            rels.append({
                "source ID": by_kind[st][(pi + j) % len(by_kind[st])],
                "source type": st,
                "target ID": by_kind[tt][(pi * 2 + j) % len(by_kind[tt])],
                "target type": tt,
            })
    rels.append({"source ID": None, "source type": "mitigation",
                 "target ID": "T1001", "target type": "technique"})  # P3 drop
    rels.append({"source ID": "M1000", "source type": "mitigation",
                 "target ID": "T9999", "target type": "technique"})  # J4 dangling
    rels.append({"source ID": "G0100", "source type": "group",
                 "target ID": "T1001", "target type": "procedure"})  # no catalog pair
    return ents, rels


def dict_capec() -> list[dict]:
    """parse.py:272-431 projection; empty arrays exercise the [*]
    emits-nothing path; Taxonomy_Mappings reference fixture technique ids."""
    rows = []
    for i, cid in enumerate(CAPEC_IDS):
        num = cid.split("-")[1]
        empty = i == 3
        rows.append({
            "ID": num,
            "Name": f"Fixture Pattern {num}",
            "Abstraction": ["Standard", "Detailed", "Meta"][i % 3],
            "Status": "Stable",
            "Description": f"Fixture attack pattern {cid} description (case {i}).",
            "Extended_Description": [] if empty else [
                f"Extended paragraph one for {cid}.",
                f"Extended paragraph two for {cid}."][: (i % 3)],
            "Likelihood_Of_Attack": "Medium" if i % 2 else "High",
            "Typical_Severity": ["Low", "Medium", "High", "Very High"][i % 4],
            "Related_Attack_Patterns": [] if empty else [
                f"ChildOf CAPEC-{CAPEC_IDS[(i + 1) % len(CAPEC_IDS)].split('-')[1]}"],
            "Execution_Flow": [] if empty else [
                f"STEP-1 (Explore): Probe the fixture target | TECHNIQUE-1: scan {num}",
                f"STEP-2 (Exploit): Trigger case {i}"][: (i % 2) + 1],
            "Prerequisites": [] if empty else [f"Target runs fixture stack {i % 4}."],
            "Skills_Required": [] if empty else [
                f"Level:Medium - Description:Fixture skill {num}"],
            "Resources_Required": [] if empty else [f"Fixture resource {num}"],
            "Consequences": [] if empty else [
                f"SCOPE:Confidentiality,Integrity - IMPACT:Read Data ({num})"],
            "Mitigations": [] if empty else [f"Deploy fixture guard {num}."],
            "Example_Instances": [] if empty else ([f"Observed in fixture app {num}."] if i % 2 else []),
            "Related_Weaknesses": [] if empty else [
                CWE_IDS[(i * 2) % len(CWE_IDS)], CWE_IDS[(i * 2 + 1) % len(CWE_IDS)]],
            "Taxonomy_Mappings": [] if empty else [
                TECHNIQUE_IDS[i % len(TECHNIQUE_IDS)]],
        })
    return rows


def dict_d3fend() -> list[dict]:
    """parse.py:84-106 projection; one row with empty off_tech_id (no
    ucoexhasMITREATTACK edge, d3fend_rml.ttl:47-53)."""
    rows = []
    names = ["Decoy File Lattice", "Credential Rotation Fence",
             "Inbound Session Veil", "Process Lineage Audit",
             "Message Digest Tripwire", "Boot Chain Attestation"]
    for i, nm in enumerate(names):
        rows.append({
            "@id": f"d3f:Fixture{i:02d}",
            "d3f:definition": f"Fixture defensive technique: {nm.lower()}.",
            "d3f:d3fend-id": D3FEND_IDS[i],
            "rdfs:label": nm,
            "off_tech_id": "" if i == 4 else TECHNIQUE_IDS[i % len(TECHNIQUE_IDS)],
        })
    return rows


def alias_table() -> list[dict]:
    """Graft-only: vendor/product surface forms → canonical cpe vendor:product
    keys, with typos/styling variants for the TF-IDF + alias linker."""
    rows = []
    styles = [
        lambda v, p: f"{v.capitalize()} {p.capitalize()}",
        lambda v, p: f"{v}-{p}",
        lambda v, p: f"{v.upper()} {p}",
        lambda v, p: f"{v.capitalize()}'s {p}",
    ]
    for vi, vendor in enumerate(VENDORS):
        for pi in range(4):
            product = PRODUCTS[(vi + pi) % len(PRODUCTS)]
            canonical = f"{vendor}:{product}"
            for si, style in enumerate(styles[: 2 + (vi + pi) % 3]):
                rows.append({
                    "surface_form": style(vendor, product),
                    "canonical_id": canonical,
                    "kind": "vendor_product",
                    "prior": round(1.0 - 0.1 * si, 2),
                })
    # typo aliases for the two hot vendors (fuzzy-linking path)
    rows.append({"surface_form": "Acme Soft WebGate", "canonical_id": "acmesoft:webgate",
                 "kind": "vendor_product", "prior": 0.6})
    rows.append({"surface_form": "Globex DB Core", "canonical_id": "globex:dbcore",
                 "kind": "vendor_product", "prior": 0.6})
    for tid, nm in TECHNIQUE_NAMES.items():
        rows.append({"surface_form": nm, "canonical_id": tid,
                     "kind": "technique", "prior": 1.0})
    return rows
