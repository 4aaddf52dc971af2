"""Oracle dtype-fidelity audit core.

The external correctness gate canonicalizes Spark and DuckDB results through
pandas with a dtype-aware hash: ``6`` (int64) != ``6.0`` (float64), HUGEINT
(int128) != BIGINT, and list-typed cells crash the canonicalizer outright.
The invariant that makes the hash safe is *logical type equality at the
source*: every oracle column must carry the same logical type as its Spark
twin, and no oracle may emit HUGEINT / DECIMAL / nested types at all.

Used by scripts/dtype_audit.py (standalone sweep) and
tests/test_oracle_dtypes.py (the permanent per-query gate).
"""

from __future__ import annotations

# DuckDB logical type -> the Spark simpleString it must pair with.
# None = forbidden outright (driver-hash hazard regardless of the Spark side).
DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "UBIGINT": None,
    "HUGEINT": None,       # int128: pandas converts to float64/object
    "UHUGEINT": None,
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP_NS": None,  # pandas unit mismatch vs Spark micros
    "TIMESTAMP WITH TIME ZONE": None,
    "BLOB": "binary",
    "INTERVAL": None,
}


def duck_spark_mismatches(duck_cols, duck_types, spark_schema):
    """Return a list of (col, duck_type, spark_type, why) mismatch tuples
    (empty = the oracle/Spark pair is dtype-safe for the driver hash)."""
    flags = []
    spark_by_name = {f.name: f.dataType.simpleString() for f in spark_schema}
    if sorted(duck_cols) != sorted(spark_by_name):
        return [("<columns>", str(sorted(duck_cols)),
                 str(sorted(spark_by_name)), "column-name mismatch")]
    for col, dt in zip(duck_cols, duck_types):
        d = str(dt)
        s = spark_by_name[col]
        if d.startswith("DECIMAL"):
            flags.append((col, d, s, "DECIMAL oracle output: cast to DOUBLE"))
            continue
        if "[]" in d or d.startswith("STRUCT") or d.startswith("MAP"):
            flags.append((col, d, s,
                          "nested oracle output: serialize or explode"))
            continue
        want = DUCK_TO_SPARK.get(d, "<unknown>")
        if want is None:
            flags.append((col, d, s, f"forbidden oracle type {d}"))
        elif want == "<unknown>":
            flags.append((col, d, s, f"unmapped duck type {d}"))
        elif s != want:
            flags.append((col, d, s, f"spark {s} != expected {want}"))
        # nested Spark outputs are a hazard even when the oracle isn't
        if s.startswith(("array", "struct", "map")):
            flags.append((col, d, s, "nested SPARK output: serialize"))
    return flags
