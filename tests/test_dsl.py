"""DSL parser/compiler tests (miller_ray.dsl) — expression semantics
pinned against the reference's put/filter behavior
(pkg/dsl/cst, pkg/bifs/arithmetic.go, put_or_filter.go)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from miller_ray import dsl


def _tbl():
    return pa.table({
        "x": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "y": pa.array([10.0, 20.0, 30.0, 40.0, 50.0]),
        "s": pa.array(["ab", "cd", "ae", "xy", "az"]),
    })


def run(src, t=None):
    out, mask, bare = dsl.compile_program(src).run(t if t is not None else _tbl())
    return out, (bare if bare is not None else mask)


def test_arith_precedence():
    out, _ = run("$z = $x + 2 * 3")
    assert out["z"].to_pylist() == [7, 8, 9, 10, 11]
    out, _ = run("$z = ($x + 2) * 3")
    assert out["z"].to_pylist() == [9, 12, 15, 18, 21]
    out, _ = run("$z = 2 ** 3 ** 1")  # right-assoc via unary chain
    assert out["z"].to_pylist() == [8] * 5
    out, _ = run("$z = -$x + 1")
    assert out["z"].to_pylist() == [0, -1, -2, -3, -4]


def test_division_semantics():
    # int/int evenly divisible stays int (BIF_divide)
    out, _ = run("$z = $x / 1")
    assert pa.types.is_integer(out["z"].type)
    out, _ = run("$z = $y / 4")
    assert out["z"].to_pylist() == [2.5, 5.0, 7.5, 10.0, 12.5]
    out, _ = run("$z = $x // 2")
    assert out["z"].to_pylist() == [0, 1, 1, 2, 2]
    out, _ = run("$z = $x % 3")
    assert out["z"].to_pylist() == [1, 2, 0, 1, 2]


def test_string_ops():
    out, _ = run('$z = $s . "!"; $w = "pre:" . $s')
    assert out["z"].to_pylist() == ["ab!", "cd!", "ae!", "xy!", "az!"]
    assert out["w"].to_pylist()[0] == "pre:ab"
    out, _ = run('$z = toupper($s); $n = strlen($s)')
    assert out["z"].to_pylist()[0] == "AB"
    assert out["n"].to_pylist() == [2] * 5
    out, _ = run('$z = sub($s, "a", "_")')
    assert out["z"].to_pylist() == ["_b", "cd", "_e", "xy", "_z"]


def test_comparisons_and_logic():
    _, m = run('$x > 2 && $x < 5')
    assert m.to_pylist() == [False, False, True, True, False]
    _, m = run('$x == 1 || $s =~ "a"')
    assert m.to_pylist() == [True, False, True, False, True]
    _, m = run('$s !~ "a"')
    assert m.to_pylist() == [False, True, False, True, False]
    # mixed-type compare goes through string rendering
    _, m = run('$x == "3"')
    assert m.to_pylist() == [False, False, True, False, False]


def test_ternary_and_coalesce():
    out, _ = run('$z = $x >= 3 ? "big" : "small"')
    assert out["z"].to_pylist() == ["small", "small", "big", "big", "big"]
    t = pa.table({"x": pa.array([1, None, 3], type=pa.int64())})
    out, _ = run('$z = $x ?? 99', t)
    assert out["z"].to_pylist() == [1, 99, 3]


def test_statements_env_and_unset():
    out, _ = run("$a = $x * 2; $b = $a + 1; unset $y")
    assert out["b"].to_pylist() == [3, 5, 7, 9, 11]
    assert "y" not in out.column_names
    out, _ = run("$x += 10; $x *= 2")
    assert out["x"].to_pylist() == [22, 24, 26, 28, 30]


def test_literals():
    out, _ = run('$a = 0x10; $b = 1.5e2; $c = true; $d = "q\\tz"; $e = M_PI')
    assert out["a"].to_pylist() == [16] * 5
    assert out["b"].to_pylist() == [150.0] * 5
    assert out["c"].to_pylist() == [True] * 5
    assert out["d"].to_pylist()[0] == "q\tz"
    assert abs(out["e"].to_pylist()[0] - np.pi) < 1e-12


def test_braced_field_names():
    t = pa.table({"a b": pa.array([1, 2])})
    out, _ = run("${a b} = ${a b} + 1", t)
    assert out["a b"].to_pylist() == [2, 3]


def test_filter_statement():
    out, m = run("filter $x > 3")
    assert m.to_pylist() == [False, False, False, True, True]


def test_errors():
    # pipe redirects PARSE since round 4 (output streams through a
    # shell command at run time; dsl-redirects golden cases)
    dsl.compile_program('tee | "cat", $*')
    with pytest.raises(dsl.DslError):
        # unknown function: parses (could be a forward-defined UDF) but
        # fails at evaluation time
        run("$z = nofn($x)")
    with pytest.raises(dsl.DslError):
        dsl.compile_program("$z = $x +")
    # reference absent semantics (pkg/bifs/arithmetic.go times_dispositions):
    # ABSENT * INT yields the int operand, so $z = $nosuch * 2 assigns 2.
    out, _ = run("$z = $nosuch * 2")
    assert out["z"].to_pylist() == [2] * 5


def test_dataset_roundtrip(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_tbl())
    r = dsl.put_expr(ds, '$z = $x * $y').to_pandas()
    assert r["z"].tolist() == [10.0, 40.0, 90.0, 160.0, 250.0]
    r = dsl.filter_expr(ds, '$x % 2 == 1').to_pandas()
    assert r["x"].tolist() == [1, 3, 5]
    r = dsl.filter_expr(ds, '$x % 2 == 1', exclude=True).to_pandas()
    assert r["x"].tolist() == [2, 4]


def test_conditional_blocks():
    # if/elif/else compiles to vectorized masked assignment
    out, _ = run('if ($x > 3) { $y = "big"; $z = $x * 10 } '
                 'elif ($x > 1) { $y = "mid" } else { $y = "small" }')
    assert out["y"].to_pylist() == ["small", "mid", "mid", "big", "big"]
    assert out["z"].to_pylist() == [None, None, None, 40, 50]
    # AWK-style pattern-action
    out, _ = run('$x > 2 { $s = toupper($s) }')
    assert out["s"].to_pylist() == ["ab", "cd", "AE", "XY", "AZ"]
    # filter inside a branch only affects active rows
    out, m = run('if ($x > 3) { filter $x > 4 }')
    assert m.to_pylist() == [True, True, True, False, True]
    # nested blocks
    out, _ = run('if ($x > 1) { if ($x > 3) { $k = 2 } else { $k = 1 } }')
    assert out["k"].to_pylist() == [None, 1, 1, 2, 2]
