"""Native fastatomic reader: output equivalence vs the pandas path, and a
throughput sanity margin. Skipped when the extension isn't built."""

import os

import numpy as np
import pandas as pd
import pytest

from recbole_cdr_tpu.data import atomic


def write_file(path, n=5000):
    rng = np.random.default_rng(0)
    with open(path, "w") as f:
        f.write("user_id:token\titem_id:token\trating:float\n")
        for i in range(n):
            f.write(f"u{rng.integers(0, 500)}\titem {rng.integers(0, 800)}\t{rng.integers(1, 6)}\n")


@pytest.mark.skipif(atomic._fastatomic is None, reason="native extension not built")
def test_native_matches_pandas(tmp_path):
    p = str(tmp_path / "toy.inter")
    write_file(p)

    df_native, types_native = atomic.load_atomic_file(p)

    # force the pandas path
    saved = atomic._fastatomic
    atomic._fastatomic = None
    try:
        df_pandas, types_pandas = atomic.load_atomic_file(p)
    finally:
        atomic._fastatomic = saved

    assert types_native == types_pandas
    assert list(df_native.columns) == list(df_pandas.columns)
    assert (df_native["user_id"].to_numpy() == df_pandas["user_id"].to_numpy()).all()
    assert (df_native["item_id"].to_numpy() == df_pandas["item_id"].to_numpy()).all()
    np.testing.assert_allclose(
        df_native["rating"].to_numpy(np.float64), df_pandas["rating"].to_numpy(np.float64)
    )


@pytest.mark.skipif(atomic._fastatomic is None, reason="native extension not built")
def test_native_usecols(tmp_path):
    p = str(tmp_path / "toy.inter")
    write_file(p, n=100)
    df, types = atomic.load_atomic_file(p, usecols=["user_id", "rating"])
    assert list(df.columns) == ["user_id", "rating"]
    assert "item_id" not in types


@pytest.mark.skipif(atomic._fastatomic is None, reason="native extension not built")
def test_native_crlf_and_blank_line(tmp_path):
    p = str(tmp_path / "crlf.inter")
    with open(p, "wb") as f:
        f.write(b"user_id:token\trating:float\r\n")
        f.write(b"u1\t3\r\n")
        f.write(b"u2\t4\r\n")
    df, _ = atomic.load_atomic_file(p)
    assert df["user_id"].tolist() == ["u1", "u2"]
    assert df["rating"].tolist() == [3.0, 4.0]
