"""Text-format source/sink round-trips (miller_ray.io): CSV, TSV,
JSONL, DKVP, NIDX — reference record_reader_factory.go formats."""

import os

import pandas as pd
import pyarrow as pa
import pytest

from miller_ray import io as MIO


def _ds(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl)


@pytest.fixture
def sample():
    return pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "name": pa.array(["alpha", "beta", "gamma"]),
        "score": pa.array([1.5, 2.25, 3.75]),
    })


def test_csv_roundtrip(ray_session, sample, tmp_path):
    out = str(tmp_path / "csv")
    MIO.write_csv(_ds(sample), out)
    back = MIO.read_csv(out).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, sample.to_pandas())


def test_jsonl_roundtrip(ray_session, sample, tmp_path):
    out = str(tmp_path / "jsonl")
    MIO.write_jsonl(_ds(sample), out)
    back = MIO.read_jsonl(out).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["id", "name", "score"]],
                                  sample.to_pandas())


def test_dkvp_roundtrip(ray_session, sample, tmp_path):
    out = str(tmp_path / "dkvp")
    res = MIO.write_dkvp(_ds(sample), out)
    assert res["rows"].sum() == 3
    files = [os.path.join(out, f) for f in sorted(os.listdir(out))]
    with open(files[0]) as f:
        first = f.readline().strip()
    assert "=" in first and "," in first
    back = MIO.read_dkvp(files).to_pandas().sort_values("id").reset_index(drop=True)
    assert back["id"].tolist() == [1, 2, 3]
    assert back["name"].tolist() == ["alpha", "beta", "gamma"]
    assert back["score"].tolist() == [1.5, 2.25, 3.75]


def test_dkvp_heterogeneous(ray_session, tmp_path):
    p = tmp_path / "het.dkvp"
    p.write_text("a=1,b=2\nb=3,c=x\n")
    # row order from a parallel read is undefined: sort before asserting
    back = MIO.read_dkvp([str(p)]).to_pandas().sort_values("b") \
        .reset_index(drop=True)
    assert set(back.columns) == {"a", "b", "c"}
    assert back["b"].tolist() == [2, 3]
    assert pd.isna(back["a"].iloc[1])


def test_nidx_roundtrip(ray_session, sample, tmp_path):
    out = str(tmp_path / "nidx")
    MIO.write_nidx(_ds(sample), out)
    files = [os.path.join(out, f) for f in sorted(os.listdir(out))]
    back = MIO.read_nidx(files).to_pandas().sort_values("1").reset_index(drop=True)
    assert back["1"].tolist() == [1, 2, 3]
    assert back["2"].tolist() == ["alpha", "beta", "gamma"]


def test_tsv_read(ray_session, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("x\ty\n1\tfoo\n2\tbar\n")
    back = MIO.read_tsv(str(p)).to_pandas().sort_values("x")
    assert back["y"].tolist() == ["foo", "bar"]


def test_type_inference(ray_session, tmp_path):
    p = tmp_path / "ti.dkvp"
    p.write_text("i=42,f=1.25,s=hello,e=\n")
    back = MIO.read_dkvp([str(p)]).to_pandas()
    assert back["i"].iloc[0] == 42
    assert back["f"].iloc[0] == 1.25
    assert back["s"].iloc[0] == "hello"
