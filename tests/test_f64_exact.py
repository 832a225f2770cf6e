"""Float64 load fidelity (VERDICT r4 #4 — "widen or refuse loudly").

The reference carries Float64 as native ``double`` into its kernels
(/root/reference/include/csv_loader.hpp:13, src/jit.cpp:31-45).  Our
device path is f32 (JAX x64 disabled), so a FLOAT64 column either
uploads LOSSLESSLY (every value round-trips f64→f32→f64 — checked
vectorized at load) or refuses loudly with remedies; r4 silently
rounded 16777217.0 to 16777216.0.  ``config.f64_policy='downcast'``
opts into the documented <=2^-24 relative rounding explicitly.
"""

import numpy as np
import pytest

from warpdb_tpu import WarpDB
from warpdb_tpu.config import get_config
from warpdb_tpu.errors import ValidationError
from warpdb_tpu.storage import HostTable


def test_f64_non_roundtrip_refuses_loudly():
    for bad in (16777217.0, 0.1, 1e300):
        with pytest.raises(ValidationError, match="round-trip"):
            WarpDB(
                HostTable.from_dict(
                    {"x": np.array([1.0, bad], np.float64)}
                )
            )


def test_f64_roundtrip_values_load_exactly():
    # Integers to 2^24, dyadic fractions, f32-exact extremes, NaN: all
    # round-trip — the column uploads losslessly.
    vals = np.array(
        [16777216.0, -16777216.0, 0.5, 0.25, 123.125,
         float(np.finfo(np.float32).max), np.nan],
        np.float64,
    )
    db = WarpDB(HostTable.from_dict({"x": vals, "k": np.zeros(7, np.float32)}))
    out = db.query_sql_table("SELECT x FROM t")
    np.testing.assert_array_equal(
        np.asarray(out["x"], np.float64), vals
    )


def test_f64_downcast_policy_accepts_rounding():
    cfg = get_config()
    old = cfg.f64_policy
    cfg.f64_policy = "downcast"
    try:
        db = WarpDB(
            HostTable.from_dict(
                {"x": np.array([16777217.0, 0.1], np.float64)}
            )
        )
        out = db.query_sql_table("SELECT x FROM t")
        np.testing.assert_array_equal(
            np.asarray(out["x"], np.float32),
            np.array([16777217.0, 0.1], np.float64).astype(np.float32),
        )
    finally:
        cfg.f64_policy = old


def test_python_float_lists_stay_casual():
    # Plain Python lists infer FLOAT32 (the caller asked for "floats",
    # not 64-bit precision) — no policy trigger on 0.1.
    db = WarpDB(HostTable.from_dict({"x": [0.1, 0.2, 0.3]}))
    out = db.query_sql("SELECT SUM(x) FROM t")
    assert float(out[0]) == pytest.approx(0.6, rel=1e-6)


def test_f64_declared_dtype_is_strict():
    # An explicit FLOAT64 declaration keeps the precision contract even
    # for list input.
    from warpdb_tpu.storage.table import DataType

    with pytest.raises(ValidationError, match="round-trip"):
        WarpDB(
            HostTable.from_dict(
                {"x": [0.1, 0.2]}, dtypes={"x": DataType.FLOAT64}
            )
        )


def test_f64_aggregates_exact_when_roundtrip():
    # The VERDICT sweep analogue: exact dyadic f64 data survives GROUP
    # BY / SUM / ORDER BY bit-exactly.
    k = np.array([0, 0, 1, 1], np.float64)
    v = np.array([1.5, 2.25, 4.125, 8.0625], np.float64)
    db = WarpDB(HostTable.from_dict({"k": k, "v": v}))
    out = db.query_sql_table(
        "SELECT k, SUM(v) AS s FROM t GROUP BY k ORDER BY k ASC"
    )
    np.testing.assert_array_equal(np.asarray(out["s"], np.float64), [3.75, 12.1875])
