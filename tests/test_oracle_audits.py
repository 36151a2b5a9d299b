"""Default-suite gate for the construct-precedent audit (r9 verdict
item 3): every version-sensitive DuckDB construct in a never-driver-
green oracle must have a driver-green precedent. The sibling dtype-KIND
audit already runs in the default suite via tests/test_round9_dtype.py
— together no new key can reach a driver sample with an uncast HUGEINT
output or a zero-precedent construct."""
from __future__ import annotations

from tools import oracle_construct_audit


def test_never_green_oracles_use_precedented_constructs():
    """Every version-sensitive DuckDB construct in a never-driver-green
    oracle must have >=1 driver-green precedent (same construct, green
    key). The KM saga showed construct-level precedent is the right
    risk unit; r09's greens (welch_anova, stl_loess) gave list_reduce
    its precedents, which is why timeseries_anomaly_shesd keeps its
    oracle unchanged in r10."""
    problems = oracle_construct_audit.audit()
    assert not problems, "\n".join(problems)


def test_scale_doctrine_matches_registry_oracle_status():
    """VERDICT r11 item 5 gate: no SCALE.md doctrine bullet may claim an
    ORACLED key is rows-only without a SUPERSEDED/conversion marker —
    the r8 periodogram/cyclic lines drifted exactly this way after the
    r11 conversions."""
    from tools.gen_coverage_status import doc_consistency_issues

    issues = doc_consistency_issues()
    assert not issues, "\n".join(issues)
