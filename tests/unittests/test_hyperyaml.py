import pytest

from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


def test_basic_scalars():
    out = load_hyperpyyaml("a: 1\nb: hello\n")
    assert out == {"a": 1, "b": "hello"}


def test_ref():
    out = load_hyperpyyaml("a: 3\nb: !ref <a>\n")
    assert out["b"] == 3


def test_ref_arithmetic():
    out = load_hyperpyyaml("a: 3\nb: !ref <a> * 2 + 1\n")
    assert out["b"] == 7


def test_ref_string_concat():
    out = load_hyperpyyaml("dir: /tmp\nf: !ref <dir>/file.txt\n")
    assert out["f"] == "/tmp/file.txt"


def test_new_object():
    yaml_str = """
thing: !new:collections.Counter
    a: 2
"""
    out = load_hyperpyyaml(yaml_str)
    assert out["thing"]["a"] == 2


def test_new_positional():
    yaml_str = """
thing: !new:fractions.Fraction
    - 1
    - 4
"""
    out = load_hyperpyyaml(yaml_str)
    assert float(out["thing"]) == 0.25


def test_name_partial():
    yaml_str = """
make: !name:fractions.Fraction
    - 3
"""
    out = load_hyperpyyaml(yaml_str)
    frac = out["make"](4)
    assert float(frac) == 0.75


def test_apply():
    yaml_str = "result: !apply:math.sqrt [16]\n"
    out = load_hyperpyyaml(yaml_str)
    assert out["result"] == 4.0


def test_object_sharing():
    yaml_str = """
obj: !new:collections.Counter {}
same: !ref <obj>
"""
    out = load_hyperpyyaml(yaml_str)
    assert out["obj"] is out["same"]


def test_copy_not_shared():
    yaml_str = """
obj: !new:collections.Counter {}
clone: !copy <obj>
"""
    out = load_hyperpyyaml(yaml_str)
    assert out["obj"] is not out["clone"]


def test_overrides():
    out = load_hyperpyyaml("a: 1\nb: !ref <a>\n", overrides={"a": 5})
    assert out["b"] == 5


def test_overrides_yaml_string():
    out = load_hyperpyyaml("a: 1\n", overrides="a: 9")
    assert out["a"] == 9


def test_nested_ref():
    yaml_str = """
cfg:
    lr: 0.1
use: !ref <cfg[lr]>
"""
    out = load_hyperpyyaml(yaml_str)
    assert out["use"] == 0.1


def test_placeholder_raises():
    with pytest.raises(ValueError):
        load_hyperpyyaml("x: !PLACEHOLDER\n")
    out = load_hyperpyyaml("x: !PLACEHOLDER\n", overrides={"x": 2})
    assert out["x"] == 2


def test_tuple():
    out = load_hyperpyyaml("t: !tuple [1, 2]\n")
    assert out["t"] == (1, 2)


def test_forward_ref():
    out = load_hyperpyyaml("b: !ref <a>\na: 4\n")
    assert out["b"] == 4


def test_circular_ref_raises():
    with pytest.raises(ValueError):
        load_hyperpyyaml("a: !ref <b>\nb: !ref <a>\n")
