"""Local mirror of the driver's Spark-vs-DuckDB comparison.

BIT-EXACT by default: the full oracled inventory measures bit-identical to
DuckDB at sf0.01 (registry parity rules make it so), and the driver hashes
values — so the local gate demands exact equality too. Pass
``float_rtol`` explicitly for a query that genuinely cannot be exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # arrays/lists -> tuples so they sort & compare
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def _dtype_kind(s: pd.Series) -> str:
    """Hash-relevant dtype KIND of a column as the driver's value-hash
    sees it. The driver stringifies materialized pandas values, so int64
    6001 ('6001') vs float64 6001.0 ('6001.0') hash-diverge even when
    every value is numerically identical — the root cause of the
    stats_kaplan_meier / stats_nelson_aalen r06-r08 driver-only reds
    (DuckDB HUGEINT -> pandas float64 vs Spark int64). The old compare
    coerced both sides to float and passed; this kind check makes the
    local gate exactly as strict as the driver."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if s.dtype == object:
        import decimal

        if any(isinstance(v, decimal.Decimal) for v in s.dropna().head(50)):
            return "decimal"
        return "object"
    return str(s.dtype)


def assert_frames_match(
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    name: str = "",
    float_rtol: float = 0.0,
) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    for c in spark_pdf.columns:
        sk, ok = _dtype_kind(spark_pdf[c]), _dtype_kind(oracle_pdf[c])
        # decimal<->float is driver-tolerated (empirical: agg_decimal_exact
        # r04, ml_threshold_tuning r07, stats_power_sample_size r08 all
        # GREEN across a Decimal-object/float64 dtype split — the driver
        # normalizes Decimals numerically). int<->float is NOT (the KM/NA
        # r06-r08 reds). Collapse decimal to float before comparing kinds.
        sk = "float" if sk == "decimal" else sk
        ok = "float" if ok == "decimal" else ok
        assert sk == ok, (
            f"{name}: column {c!r} dtype-kind mismatch spark={sk} vs oracle={ok}"
            " — identical values would still hash-diverge in the driver"
            " (e.g. uncast HUGEINT in the oracle vs Spark int64)"
        )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            if float_rtol:
                close = np.isclose(af, bf, rtol=float_rtol, atol=float_rtol)
            else:
                # bit-exact INCLUDING the sign of zero: -0.0 == 0.0 under
                # IEEE ==, but a stringifying value-hash sees '-0.0' vs
                # '0.0' — same driver-hash sensitivity class as the
                # int/float dtype split above.
                close = (af == bf) & (np.signbit(af) == np.signbit(bf))
            bad = ~(close | both_nan)
            assert not bad.any(), (
                f"{name}: column {c} differs at rows {np.where(bad)[0][:5]}: "
                f"{af[bad][:5]} vs {bf[bad][:5]}"
            )
        else:
            same = av.fillna("__null__").to_numpy() == bv.fillna("__null__").to_numpy()
            assert same.all(), (
                f"{name}: column {c} differs at rows {np.where(~same)[0][:5]}: "
                f"{av[~same][:5].tolist()} vs {bv[~same][:5].tolist()}"
            )
