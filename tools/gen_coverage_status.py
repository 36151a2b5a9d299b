#!/usr/bin/env python
"""Regenerate COVERAGE.md's per-key driver-status table from the actual
CORRECTNESS_r*.json files, so claimed counts can never drift from driver
evidence (round-4 verdict item 8).

Splices the table between the BEGIN/END GENERATED-STATUS markers in
COVERAGE.md (appends the section if absent).

Usage:  python tools/gen_coverage_status.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402

BEGIN = "<!-- BEGIN GENERATED DRIVER-STATUS (tools/gen_coverage_status.py) -->"
END = "<!-- END GENERATED DRIVER-STATUS -->"


def latest_rows() -> dict[str, tuple[str, dict]]:
    """key -> (round label, row) from the highest round that sampled it."""
    out: dict[str, tuple[str, dict]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        label = re.search(r"CORRECTNESS_(r\d+)\.json$", path).group(1)
        with open(path) as fh:
            data = json.load(fh)
        if isinstance(data, dict):
            for key, row in data.items():
                out[key] = (label, row)
    return out


def status_of(row: dict) -> str:
    flags = (row.get("rows_match"), row.get("schema_match"), row.get("hash_match"))
    err = row.get("err")
    if err == "no_oracle":
        return "rows-only ran"
    if any(f is False for f in flags) or err is not None:
        return "FAIL"
    return "pass"


# Status-claim phrases in doctrine bullets ("-> rows-only", "stays
# rows-only", "rows-only with numpy twins", ...) vs markers that exempt a
# bullet (superseded ledger lines, conversion narratives).
_CLAIM_RE = re.compile(
    r"(->|stays?|remains?)\s+rows-only|rows-only (by design|with)", re.I
)
_EXEMPT_RE = re.compile(r"oracled|converted|upgraded", re.I)
# an explicit [SUPERSEDED ...] ledger marker exempts the WHOLE bullet by
# convention (SCALE.md:861 keeps the original stale text after the
# marker as a dated ledger line); the softer conversion vocabulary only
# exempts the sentence it appears in (ADVICE r12 item 1)
_SUPERSEDED_RE = re.compile(r"SUPERSEDED")


def doc_consistency_issues(text: str | None = None) -> list[str]:
    """SCALE.md bullets claiming an ORACLED key is rows-only (VERDICT r11
    item 5: round 11 converted periodogram/cyclic but the r8 doctrine
    bullet still said rows-only — stale doctrine must carry a SUPERSEDED
    marker or name the conversion). Scans doctrine BULLETS only (lines
    grouped under a leading '- '); section prose narrating conversions
    exempts itself via the conversion vocabulary."""
    _ensure_loaded()  # callable standalone (the pytest gate imports this)
    if text is None:
        with open(os.path.join(ROOT, "SCALE.md")) as fh:
            text = fh.read()
    oracled = {k for k, q in REGISTRY.items() if q.oracle is not None}
    issues = []
    for chunk in re.split(r"\n(?=- |#)", text):
        if not chunk.startswith("- "):
            continue
        if _SUPERSEDED_RE.search(chunk):
            continue
        # the conversion-vocabulary exemption must sit in the SAME
        # sentence as the rows-only claim (ADVICE r12 item 1: a
        # bullet-wide exemption lets an unrelated "converted" sentence
        # mask true drift elsewhere in the bullet)
        claiming = [
            s
            for s in re.split(r"(?<=[.;])\s+", chunk)
            if _CLAIM_RE.search(s) and not _EXEMPT_RE.search(s)
        ]
        if not claiming:
            continue
        # match subject keys in the bullet HEAD only (up to the first
        # colon / end of first line) — a bullet about some rows-only key
        # that merely MENTIONS an oracled key in its prose must not flag
        # (r12 self-review: bare-substring matching over the whole
        # bullet would fail CI on correct sentences)
        head = chunk.split(":", 1)[0]  # "- **key / key2**" may wrap lines
        for k in sorted(oracled):
            # word boundary: key stream_sessionize must not match a
            # bullet head naming stream_sessionize_v2 (ADVICE r12 item 1)
            if re.search(rf"(?<![A-Za-z0-9_]){re.escape(k)}(?![A-Za-z0-9_])", head):
                issues.append(
                    f"SCALE.md claims rows-only for ORACLED key {k}: "
                    f"{chunk[:100]!r}"
                )
    return issues


def expected_counts() -> dict[str, int]:
    """Freshly computed status counts from the CORRECTNESS union."""
    _ensure_loaded()
    latest = latest_rows()
    counts = {"pass": 0, "FAIL": 0, "rows-only ran": 0, "never": 0}
    for name in REGISTRY:
        counts[status_of(latest[name][1]) if name in latest else "never"] += 1
    return counts


_TOTALS_RE = re.compile(
    r"\*\*Totals\*\*: (\d+) keys — (\d+) driver-pass, (\d+) rows-only "
    r"sampled-and-ran, (\d+) stale-FAIL, (\d+) never-sampled\."
)


def totals_line_issues(text: str | None = None) -> list[str]:
    """COVERAGE.md's generated Totals line vs the freshest CORRECTNESS
    union (VERDICT r12 item 1: the table is regenerated before the driver
    round by necessity, so the committed totals lag one driver run; this
    gate makes the lag loud so round start regenerates first)."""
    if text is None:
        with open(os.path.join(ROOT, "COVERAGE.md")) as fh:
            text = fh.read()
    m = _TOTALS_RE.search(text)
    if not m:
        return ["COVERAGE.md has no generated Totals line"]
    got = tuple(int(g) for g in m.groups())
    c = expected_counts()
    want = (
        len(REGISTRY),
        c["pass"],
        c["rows-only ran"],
        c["FAIL"],
        c["never"],
    )
    if got != want:
        return [
            f"COVERAGE.md Totals line is stale: committed {got}, the "
            f"CORRECTNESS_r* union says {want} — rerun "
            "tools/gen_coverage_status.py"
        ]
    return []


def main() -> None:
    _ensure_loaded()
    issues = doc_consistency_issues()
    for msg in issues:
        print(f"DOC-DRIFT {msg}")
    latest = latest_rows()
    lines = [
        BEGIN,
        "",
        "## Per-key driver status (generated — do not hand-edit)",
        "",
        "Latest driver CORRECTNESS row per registered key. `never` = not yet",
        "sampled by a driver round (the registry rotation front-loads those,",
        "see `tools/driver_rotation.py`). Local sf0.01 value parity for every",
        "oracled key is enforced separately by `pytest -m sf001`.",
        "",
        "| Key | Oracle | Latest driver row | Status |",
        "|---|---|---|---|",
    ]
    counts = {"pass": 0, "FAIL": 0, "rows-only ran": 0, "never": 0}
    for name in sorted(REGISTRY):
        oracled = "sql" if REGISTRY[name].oracle is not None else "rows-only"
        if name in latest:
            rnd, row = latest[name]
            st = status_of(row)
        else:
            rnd, st = "—", "never"
        counts[st] += 1
        lines.append(f"| {name} | {oracled} | {rnd} | {st} |")
    lines += [
        "",
        f"**Totals**: {len(REGISTRY)} keys — {counts['pass']} driver-pass, "
        f"{counts['rows-only ran']} rows-only sampled-and-ran, "
        f"{counts['FAIL']} stale-FAIL, {counts['never']} never-sampled.",
        "",
        END,
    ]
    block = "\n".join(lines)

    cov_path = os.path.join(ROOT, "COVERAGE.md")
    with open(cov_path) as fh:
        text = fh.read()
    # Keep the hand-written prose header's counts in sync too (round-5
    # verdict item 5: the "N registered queries" sentence drifted from the
    # registry while the generated table was current).
    n_oracled = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    text = re.sub(
        r"\d+ registered queries \(\d+ DuckDB-oracled, \d+ rows-only\)",
        f"{len(REGISTRY)} registered queries ({n_oracled} DuckDB-oracled, "
        f"{len(REGISTRY) - n_oracled} rows-only)",
        text,
        count=1,
    )
    if BEGIN in text:
        text = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END), block, text, flags=re.S
        )
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(cov_path, "w") as fh:
        fh.write(text)
    print(
        f"COVERAGE.md status table regenerated: {len(REGISTRY)} keys, "
        f"{counts}"
    )
    if issues:
        sys.exit(1)


if __name__ == "__main__":
    main()
