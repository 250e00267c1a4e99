"""Oracle audit XML -> typed audit_events rows (SURVEY.md §1.2).

The reference ships files opaque and leaves parsing to consumers
(README.md:30 mandates audit_trail=XML,EXTENDED so the payload shape is
fixed by Oracle's public dbserver_audittrail XSD). The engine's analytic
layer parses: one <Audit> document with repeated <AuditRecord> children
explodes to one row per record, carrying the ingest provenance columns
(src_host/src_file/src_pid — the data the reference encodes into its
Kafka key, KafkaJob.java:47).

Implementation: SQL ``xpath_*`` functions (JVM expressions, codegen'd)
— arrays per field, zipped positionally. This avoids from_xml's
per-field null quirks across records and keeps everything columnar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# field name -> (xpath leaf, spark type)
AUDIT_FIELDS: dict[str, tuple[str, str]] = {
    "audit_type": ("Audit_Type", "int"),
    "session_id": ("Session_Id", "long"),
    "statement_id": ("StatementId", "long"),
    "entry_id": ("EntryId", "long"),
    "event_ts": ("Extended_Timestamp", "timestamp"),
    "db_user": ("DB_User", "string"),
    "os_user": ("OS_User", "string"),
    "userhost": ("Userhost", "string"),
    "os_process": ("OS_Process", "string"),
    "terminal": ("Terminal", "string"),
    "instance_number": ("Instance_Number", "int"),
    "object_schema": ("Object_Schema", "string"),
    "object_name": ("Object_Name", "string"),
    "action": ("Action", "int"),
    "returncode": ("Returncode", "int"),
    "scn": ("Scn", "long"),
    "dbid": ("DBID", "long"),
    "sql_text": ("Sql_Text", "string"),
    "sql_binds": ("Sql_Bind", "string"),
}


# One <AuditRecord>...</AuditRecord> chunk per row; (?s) tolerates any
# residual newlines (ingest has already newline-stripped).
_RECORD_RE = r"(?s)<AuditRecord[^>]*>.*?</AuditRecord>"


def parse_audit_records(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Explode whole-file audit documents into one typed row per
    <AuditRecord>, preserving all other (provenance) columns.

    Each record chunk is regex-extracted (well-formed on its own) and its
    fields read with xpath_string — a scalar JVM expression per field.
    Absent elements yield '' -> NULL via nullif before the typed cast."""
    records = F.regexp_extract_all(value_col, F.lit(_RECORD_RE), 0)
    passthrough = [c for c in df.columns if c != value_col]
    exploded = df.select(*passthrough, F.explode(records).alias("_rec"))
    typed = [
        F.nullif(
            F.expr(f"xpath_string(_rec, 'AuditRecord/{leaf}')"), F.lit("")
        )
        .cast(dtype)
        .alias(name)
        for name, (leaf, dtype) in AUDIT_FIELDS.items()
    ]
    return exploded.select(*passthrough, *typed)


# Spark 4's native XML path — the same record chunks parsed by
# from_xml against an explicit per-record schema instead of per-field
# xpath. Kept as a first-class twin (equivalence-tested) so callers on
# Spark >= 4 can pick either: from_xml is one expression per record
# (vs one per field) and benefits from schema pruning, while xpath_*
# sidesteps from_xml's permissive-mode null quirks; the equivalence
# test is what makes that a choice instead of a risk.
# Every field reads as STRING first: from_xml yields '' for an empty
# (present-but-valueless) element where xpath_string also yields '' —
# only an identical nullif-then-cast on EVERY field makes '' and
# absent both land NULL on both parsers (an int-typed from_xml field
# would hide the divergence for numerics but not strings).
_XML_SCHEMA = ", ".join(
    f"{leaf} string" for _, (leaf, _) in AUDIT_FIELDS.items()
)


def parse_audit_records_xml(df: DataFrame, value_col: str = "value") -> DataFrame:
    """from_xml twin of :func:`parse_audit_records` — identical output
    schema and values (asserted in tests/test_audit_analytics.py)."""
    records = F.regexp_extract_all(value_col, F.lit(_RECORD_RE), 0)
    passthrough = [c for c in df.columns if c != value_col]
    exploded = df.select(*passthrough, F.explode(records).alias("_rec"))
    parsed = exploded.withColumn(
        "_p", F.from_xml("_rec", _XML_SCHEMA)
    )
    typed = [
        F.nullif(F.col(f"_p.{leaf}"), F.lit("")).cast(dtype).alias(name)
        for name, (leaf, dtype) in AUDIT_FIELDS.items()
    ]
    return parsed.select(*passthrough, *typed)
