"""URI templating + the §2.9 triple-emission catalog as data.

Every constant cites its RML declaration in /root/reference/mapping/.
Templating is plain string substitution with no escaping — ids are URL-safe
in practice, exactly as rmlmapper treats ``rr:template`` here
(SURVEY.md §2.7 F1).

NAMESPACE QUIRK (faithfully reproduced): entity URIs live under
``http://purl.org/cyber/uco#`` / ``http://example.com/ucoex#``, but class
and predicate URIs are *concatenated without the hash*, e.g.
``http://purl.org/cyber/ucoVulnerability``
(/root/reference/mapping/cve/cve_rml.ttl:30) and
``http://example.com/ucoexhasCPE`` (cve_rml.ttl:73).
"""

from __future__ import annotations

# --- namespaces -----------------------------------------------------------
UCO_HASH = "http://purl.org/cyber/uco#"  # entity ns (cve_rml.ttl:29)
UCO_BARE = "http://purl.org/cyber/"  # class/pred ns (cve_rml.ttl:30)
EX_HASH = "http://example.com/ucoex#"  # entity ns (cve_rml.ttl:75)
EX_BARE = "http://example.com/"  # class/pred ns (cve_rml.ttl:73)
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"
XSD_DATETIME = XSD + "dateTime"
XSD_BOOLEAN = XSD + "boolean"
RDF_JSON = "http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON"

# --- classes --------------------------------------------------------------
CL_VULNERABILITY = UCO_BARE + "ucoVulnerability"  # cve_rml.ttl:30
CL_CVE = UCO_BARE + "ucoCVE"  # cve_rml.ttl:61,81
CL_CPE = EX_BARE + "ucoexCPE"  # cve_rml.ttl:76,156
CL_EXPLOIT_TARGET = UCO_BARE + "ucoExploitTarget"  # cve_rml.ttl:208
CL_CWE = UCO_BARE + "ucoCWE"  # cve_rml.ttl:221; cwe_rml.ttl:69
CL_OBSERVED_EXAMPLE = EX_BARE + "ucoexObservedExample"  # cwe_rml.ttl:28
CL_ATTACK = EX_BARE + "ucoexMITREATTACK"  # attack_rml.ttl:29
CL_MITIGATIONS = EX_BARE + "ucoexMITIGATIONS"  # attack_rml.ttl:69
CL_CAMPAIGNS = EX_BARE + "ucoexCAMPAIGNS"  # attack_rml.ttl:98
CL_GROUPS = EX_BARE + "ucoexGROUPS"  # attack_rml.ttl:139
CL_SOFTWARE = EX_BARE + "ucoexSOFTWARE"  # attack_rml.ttl:180
CL_TACTICS = EX_BARE + "ucoexTACTICS"  # attack_rml.ttl:220
CL_CAPEC = EX_BARE + "ucoexCAPEC"  # capec_rml.ttl:171
CL_D3FEND = EX_BARE + "ucoexMITRED3FEND"  # d3fend_rml.ttl:56

# --- predicates: CVE batch (mapping/cve/cve_rml.ttl) ----------------------
P_PUBLISHED = UCO_BARE + "ucopublishedDateTime"  # :34
P_LAST_MODIFIED = UCO_BARE + "ucolastModifiedDateTime"  # :42
P_SUMMARY = UCO_BARE + "ucosummary"  # :51
P_HAS_CVE_ID = UCO_BARE + "ucohasCVE_ID"  # :58
P_HAS_CPE = EX_BARE + "ucoexhasCPE"  # :73
P_VULN_STATUS = UCO_BARE + "ucovulnStatus"  # :91
P_VECTOR_STRING = UCO_BARE + "ucovectorString"  # :98
P_BASE_SEVERITY = UCO_BARE + "ucobaseSeverity"  # :105
P_EXPLOITABILITY = UCO_BARE + "ucoexploitabilityScore"  # :112
P_IMPACT = UCO_BARE + "ucoimpactScore"  # :119
P_OBTAIN_ALL_PRIV = UCO_BARE + "ucoobtainAllPrivilege"  # :126
P_USER_INTERACTION = UCO_BARE + "ucouserInteractionRequired"  # :133
P_EVALUATOR_SOLUTION = UCO_BARE + "ucoevaluatorSolution"  # :140
P_CPE_NAME = EX_BARE + "cpeName"  # :159
P_CPE_NAME_ID = EX_BARE + "cpeNameId"  # :167
P_CPE_LAST_MODIFIED = EX_BARE + "lastModified"  # :175
P_CPE_TITLES = EX_BARE + "titles"  # :183
P_DICTIONARY_FOUND = EX_BARE + "dictionary_found"  # :191
P_HAS_VULNERABILITY = UCO_BARE + "ucohasVulnerability"  # :211
P_HAS_WEAKNESS = UCO_BARE + "ucohasWeakness"  # :218; cwe_rml.ttl:75

# --- predicates: CWE batch (mapping/cwe/cwe_rml.ttl) ----------------------
P_OBS_DESCRIPTION = EX_BARE + "ucoexDESCRIPTION"  # :31
P_EXAMPLE_OBSERVED_IN = UCO_BARE + "ucoexExampleObservedIn"  # :38
P_CWE_DESCRIPTION = UCO_BARE + "ucodescription"  # :87
P_CWE_ID = UCO_BARE + "ucocweID"  # :96
P_COMMON_CONSEQUENCES = UCO_BARE + "ucocommonConsequences"  # :105
P_TIME_OF_INTRODUCTION = UCO_BARE + "ucotimeOfIntroduction"  # :114
P_CWE_SUMMARY = UCO_BARE + "ucocweSummary"  # :123
P_CWE_EXT_SUMMARY = UCO_BARE + "ucocweExtendedSummary"  # :132
P_CWE_NAME = UCO_BARE + "ucocweName"  # :141
P_RELATED_WEAKNESS = UCO_BARE + "ucorelatedWeakness"  # :150 AND :158 (dual)
P_APPLICABLE_PLATFORM = UCO_BARE + "ucoapplicablePlatform"  # :167
P_MODES_OF_INTRODUCTION = UCO_BARE + "ucomodesOfIntroduction"  # :176
P_LIKELIHOOD_OF_EXPLOIT = UCO_BARE + "ucolikelihoodOfExploit"  # :185
P_DETECTION_METHODS = UCO_BARE + "ucodetectionMethods"  # :194
P_POTENTIAL_MITIGATIONS = UCO_BARE + "ucopotentialMitigations"  # :203
P_DEMONSTRATIVE_EXAMPLES = UCO_BARE + "ucodemonstrativeExamples"  # :212
P_REFERENCES = UCO_BARE + "ucoreferences"  # :221
P_MAPPING_NOTES = UCO_BARE + "ucomappingNotes"  # :230
P_RELATED_ATTACK_PATTERNS = UCO_BARE + "ucorelatedAttackPatterns"  # :239
P_ABSTRACTION = UCO_BARE + "ucoabstraction"  # :248
P_STRUCTURE = UCO_BARE + "ucostructure"  # :256
P_STATUS = UCO_BARE + "ucostatus"  # :264
P_HAS_OBSERVED_EXAMPLE = UCO_BARE + "ucohasObservedExample"  # :272

# --- predicates: ATT&CK batch (mapping/attack/attack_rml.ttl) -------------
P_EX_NAME = EX_BARE + "ucoexNAME"  # :32
P_EX_DESCRIPTION = EX_BARE + "ucoexDESCRIPTION"  # :39
P_EX_URL = EX_BARE + "ucoexURL"  # :46
P_EX_DOMAIN = EX_BARE + "ucoexDOMAIN"  # :53
P_MITIGATES = EX_BARE + "ucoexMITIGATES"  # :264
P_ATTRIBUTED_TO = EX_BARE + "ucoexATTRIBUTEDTO"  # :286
P_CAMPAIGN_USES_SOFTWARE = EX_BARE + "ucoexCampaignUsesSoftware"  # :308
P_CAMPAIGN_USES_TECHNIQUE = EX_BARE + "ucoexCampaignUsesTechnique"  # :330
P_GROUP_USES_SOFTWARE = EX_BARE + "ucoexGroupUsesSoftware"  # :352
P_GROUP_USES_TECHNIQUE = EX_BARE + "ucoexGroupUsesTechnique"  # :374
P_SOFTWARE_USES_TECHNIQUE = EX_BARE + "ucoexSoftwareUsesTechnique"  # :395

# (source type, target type) -> (predicate, subject class, target entity class)
# from attack_rml.ttl:253-403 (7 relationship TriplesMaps)
ATTACK_REL_CATALOG: dict[tuple[str, str], tuple[str, str, str]] = {
    ("mitigation", "technique"): (P_MITIGATES, CL_MITIGATIONS, CL_ATTACK),
    ("campaign", "group"): (P_ATTRIBUTED_TO, CL_CAMPAIGNS, CL_GROUPS),
    ("campaign", "software"): (P_CAMPAIGN_USES_SOFTWARE, CL_CAMPAIGNS, CL_SOFTWARE),
    ("campaign", "technique"): (P_CAMPAIGN_USES_TECHNIQUE, CL_CAMPAIGNS, CL_ATTACK),
    ("group", "software"): (P_GROUP_USES_SOFTWARE, CL_GROUPS, CL_SOFTWARE),
    ("group", "technique"): (P_GROUP_USES_TECHNIQUE, CL_GROUPS, CL_ATTACK),
    ("software", "technique"): (P_SOFTWARE_USES_TECHNIQUE, CL_SOFTWARE, CL_ATTACK),
}

# entity kind -> class (attack_rml.ttl entity maps)
ATTACK_ENTITY_CLASS = {
    "technique": CL_ATTACK,
    "mitigation": CL_MITIGATIONS,
    "campaign": CL_CAMPAIGNS,
    "group": CL_GROUPS,
    "software": CL_SOFTWARE,
    "tactic": CL_TACTICS,
}

# --- predicates: CAPEC batch (mapping/capec/capec_rml.ttl) -----------------
P_HAS_RELATED_WEAKNESS = EX_BARE + "ucoexhasRelatedWeakness"  # :35
P_CAPEC_ID = EX_BARE + "ucoexCAPEC_id"  # :42
P_CAPEC_NAME = EX_BARE + "ucoexCAPEC_name"  # :49
P_CAPEC_ABSTRACTION = EX_BARE + "ucoexAbstraction"  # :56
P_CAPEC_LIKELIHOOD = EX_BARE + "ucoexLikelihood"  # :63
P_CAPEC_SEVERITY = EX_BARE + "ucoexSeverity"  # :70
P_CAPEC_DESCRIPTION = EX_BARE + "ucoexDescription"  # :77
P_CAPEC_EXT_DESCRIPTION = EX_BARE + "ucoexExtendedDescription"  # :84
P_CAPEC_RELATED_ATT = EX_BARE + "ucoexRelatedAttPattern"  # :91
P_CAPEC_EXEC_FLOW = EX_BARE + "ucoexExecutionFlowTechnique"  # :98
P_CAPEC_PREREQUISITES = EX_BARE + "ucoexPrerequisites"  # :105
P_CAPEC_SKILLS = EX_BARE + "ucoexSkills_Required"  # :112
P_CAPEC_RESOURCES = EX_BARE + "ucoexResources_Required"  # :119
P_CAPEC_MITIGATIONS = EX_BARE + "ucoexMitigations"  # :126
P_CAPEC_EXAMPLE = EX_BARE + "ucoexExample"  # :133
P_CAPEC_RELATED_WEAKNESSES = EX_BARE + "ucoexRelatedWeaknesses"  # :140
P_CAPEC_TAXONOMY_ATTACK = EX_BARE + "ucoexTaxonomyMappingATTACK"  # :147
P_CAPEC_CONSEQUENCES = EX_BARE + "ucoexConsequences"  # :154
P_HAS_TAXONOMY_MAPPING = EX_BARE + "ucoexhasTaxonomyMapping"  # :162

# --- predicates: D3FEND batch (mapping/d3fend/d3fend_rml.ttl) --------------
# NOTE: ucoexMITRED3FEND_ID is defined with rml:reference "d3f:d3fend-id'"
# (stray quote, d3fend_rml.ttl:29) — the field never resolves, so the
# reference emits NO _ID triples. We reproduce that: the constant exists for
# documentation; no emitter uses it (SURVEY.md §2.9 D3FEND note).
P_D3FEND_ID_NEVER_EMITTED = EX_BARE + "ucoexMITRED3FEND_ID"  # :27
P_D3FEND_DEFINITION = EX_BARE + "ucoexMITRED3FEND_DEFINITION"  # :34
P_D3FEND_LABEL = EX_BARE + "ucoexMITRED3FEND_LABEL"  # :41
P_HAS_MITRE_ATTACK = EX_BARE + "ucoexhasMITREATTACK"  # :48


# --- entity URI templates (rr:template, plain substitution) ---------------
def uri_vuln(cve_id: str) -> str:
    return f"{UCO_HASH}VULN-{cve_id}"  # cve_rml.ttl:29


def uri_uco(local: str) -> str:
    return f"{UCO_HASH}{local}"  # cve_rml.ttl:60,80; cwe_rml.ttl:40,68


def uri_exploit_target(local: str) -> str:
    return f"{UCO_HASH}ExploitTarget-{local}"  # cve_rml.ttl:207; cwe_rml.ttl:55


def uri_ucoex(local: str) -> str:
    return f"{EX_HASH}{local}"  # cve_rml.ttl:75,155; attack_rml.ttl:28


def uri_observed_example(cwe_id: str, reference: str) -> str:
    return f"{EX_HASH}{cwe_id}-{reference}"  # cwe_rml.ttl:27,274


def uri_capec(capec_numeric_id: str) -> str:
    return f"https://capec.mitre.org/data/definitions/{capec_numeric_id}.html"  # capec_rml.ttl:170


def capec_label(capec_numeric_id: str, name: str) -> str:
    return f"CAPEC-{capec_numeric_id}: {name}"  # capec_rml.ttl:29
