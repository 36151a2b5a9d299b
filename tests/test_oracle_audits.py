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


def test_doc_drift_lint_detects_and_exempts():
    """The lint's detector and both guards, on synthetic bullets: a
    head-named ORACLED key with a rows-only claim flags; the same claim
    about a rows-only key that merely MENTIONS an oracled key in prose
    does not; a SUPERSEDED marker exempts."""
    from tools.gen_coverage_status import doc_consistency_issues

    bad = (
        "- **timeseries_periodogram**: sin/cos are libm -> rows-only "
        "with numpy twins (doctrine)."
    )
    assert doc_consistency_issues(bad), "true drift must flag"
    mention = (
        "- **dedup_simhash**: stays rows-only (engine hash; unlike "
        "text_bpe_train_merges, whose fold is exact-integer)."
    )
    assert doc_consistency_issues(mention) == [], "prose mention must not"
    superseded = bad.replace("sin/cos", "[SUPERSEDED r11] sin/cos")
    assert doc_consistency_issues(superseded) == []
    # ADVICE r12 item 1: word-boundary key match — a bullet head naming
    # a LONGER hypothetical key containing an oracled key's name must
    # not flag; and the exemption must live in the SAME sentence as the
    # claim (a "converted" sentence elsewhere in the bullet can't mask
    # a drifted claim sentence)
    longer = bad.replace("timeseries_periodogram**", "timeseries_periodogram_v2**")
    assert doc_consistency_issues(longer) == [], "suffix key must not match"
    masked = (
        "- **timeseries_periodogram**: round 11 converted the sibling. "
        "This one stays rows-only with numpy twins."
    )
    assert doc_consistency_issues(masked), "other-sentence exemption must not mask"


def test_coverage_totals_line_matches_correctness_union():
    """VERDICT r12 item 1 gate: COVERAGE.md's generated Totals line must
    equal the freshest CORRECTNESS_r* union — the committed table lags
    one driver run by necessity, so this fails loudly at round start
    until tools/gen_coverage_status.py is rerun (the round's first
    commit)."""
    from tools.gen_coverage_status import totals_line_issues

    issues = totals_line_issues()
    assert not issues, "\n".join(issues)
