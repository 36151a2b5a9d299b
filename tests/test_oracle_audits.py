"""Default-suite gates for the two mechanical oracle audits (r9 verdict
item 3): the dtype-KIND audit that makes the kaplan_meier class of
driver-only red structurally impossible, and the construct-precedent
audit that flags oracle constructs the driver's DuckDB build has never
evaluated green. Both existed as tools since r9; running them in the
default suite means NO new key can reach a driver sample with an
uncast HUGEINT output or a zero-precedent construct."""
from __future__ import annotations

from tools import oracle_construct_audit, oracle_dtype_audit


def test_registry_oracle_dtype_kinds_match(spark, duck, sf_dir):
    """Static whole-registry audit: for every oracled key, DuckDB
    DESCRIBE's materialized pandas dtype KIND must equal the Spark lazy
    schema's kind per column. An uncast HUGEINT (float64 in pandas) vs
    a Spark BIGINT (int64) hashes differently on identical values —
    the exact r06-r08 survival-pair failure. No query executes; plans
    build lazily (~2 min for 372 oracles)."""
    problems = oracle_dtype_audit.audit(spark, duck, sf_dir)
    assert not problems, "\n".join(problems)


def test_never_green_oracles_use_precedented_constructs():
    """Every version-sensitive DuckDB construct in a never-driver-green
    oracle must have >=1 driver-green precedent (same construct, green
    key). The KM saga showed construct-level precedent is the right
    risk unit; r09's greens (welch_anova, stl_loess) gave list_reduce
    its precedents, which is why timeseries_anomaly_shesd keeps its
    oracle unchanged in r10."""
    problems = oracle_construct_audit.audit()
    assert not problems, "\n".join(problems)
