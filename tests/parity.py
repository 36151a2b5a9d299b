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


def assert_frames_match(
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    name: str = "",
    float_rtol: float = 0.0,
) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
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
                close = af == bf  # bit-exact
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
