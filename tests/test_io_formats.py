"""Round-trip tests for the multi-line text formats promoted into
miller_ray.io (xtab / pprint / markdown / yaml / recutils)."""

import os

import pyarrow as pa
import pytest
import ray.data as rd

from miller_ray import io as mio


@pytest.fixture
def sample_ds(ray_session):
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"],
                  "c": [1.5, 2.5, 3.5]})
    return rd.from_arrow(t).repartition(1)


def _roundtrip(tmp_path, sample_ds, writer, reader, ext):
    out = str(tmp_path / f"out_{ext}")
    res = writer(sample_ds, out)
    assert res["rows"].sum() == 3
    files = [os.path.join(out, f) for f in os.listdir(out)]
    back = reader(files).to_pandas().sort_values("a").reset_index(drop=True)
    assert back["a"].tolist() == [1, 2, 3]
    assert back["b"].tolist() == ["x", "y", "z"]
    assert back["c"].tolist() == [1.5, 2.5, 3.5]


def test_xtab_roundtrip(tmp_path, sample_ds):
    _roundtrip(tmp_path, sample_ds, mio.write_xtab, mio.read_xtab, "xtab")


def test_pprint_roundtrip(tmp_path, sample_ds):
    _roundtrip(tmp_path, sample_ds, mio.write_pprint, mio.read_pprint,
               "pprint")


def test_markdown_roundtrip(tmp_path, sample_ds):
    _roundtrip(tmp_path, sample_ds, mio.write_markdown, mio.read_markdown,
               "md")


def test_yaml_roundtrip(tmp_path, sample_ds):
    _roundtrip(tmp_path, sample_ds, mio.write_yaml, mio.read_yaml, "yaml")


def test_recutils_read(tmp_path, ray_session):
    p = tmp_path / "r.rec"
    p.write_text("# comment\nName: alpha\nSize: 3\n\nName: beta\nSize: 5\n")
    df = mio.read_recutils([str(p)]).to_pandas()
    assert df["Name"].tolist() == ["alpha", "beta"]
    assert df["Size"].tolist() == [3, 5]


def test_xtab_heterogeneous(tmp_path, ray_session):
    p = tmp_path / "h.xtab"
    p.write_text("a 1\nb 2\n\nb 3\nc 4\n")
    df = mio.read_xtab([str(p)]).to_pandas()
    assert list(df.columns) == ["a", "b", "c"]
    assert df["b"].tolist() == [2, 3]


def test_pprint_void_dash(tmp_path, ray_session):
    p = tmp_path / "v.pprint"
    p.write_text("a b\n1 -\n2 9\n")
    df = mio.read_pprint([str(p)], infer_types=False).to_pandas()
    assert df["b"].tolist() == ["", "9"]
