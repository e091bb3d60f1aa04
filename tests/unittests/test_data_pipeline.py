import pytest

from speechbrain_tpu.utils.data_pipeline import (
    DataPipeline,
    provides,
    takes,
)


def test_chained_items():
    pipeline = DataPipeline(["text"])
    pipeline.add_dynamic_item(
        func=lambda t: t.lower(), takes="text", provides="lower"
    )
    pipeline.add_dynamic_item(
        func=lambda t: t[::-1], takes="lower", provides="rev"
    )
    pipeline.set_output_keys(["rev"])
    assert pipeline({"text": "Hello"}) == {"rev": "olleh"}


def test_decorated_items():
    @takes("a", "b")
    @provides("sum", "diff")
    def math_item(a, b):
        yield a + b
        yield a - b

    pipeline = DataPipeline(["a", "b"], [math_item], ["sum", "diff"])
    out = pipeline({"a": 5, "b": 3})
    assert out == {"sum": 8, "diff": 2}


def test_generator_partial_eval():
    calls = []

    @takes("x")
    @provides("first", "second")
    def gen(x):
        calls.append("expensive")
        yield x + 1
        yield x + 2

    pipeline = DataPipeline(["x"], [gen], ["first"])
    assert pipeline({"x": 0}) == {"first": 1}
    # Second output not requested: generator ran only once.
    assert calls == ["expensive"]


def test_lazy_evaluation():
    computed = []

    def item_a(x):
        computed.append("a")
        return x

    def item_b(x):
        computed.append("b")
        return x

    pipeline = DataPipeline(["x"])
    pipeline.add_dynamic_item(item_a, takes="x", provides="a")
    pipeline.add_dynamic_item(item_b, takes="x", provides="b")
    pipeline.set_output_keys(["a"])
    pipeline({"x": 1})
    assert computed == ["a"]  # b never runs


def test_output_key_mapping():
    pipeline = DataPipeline(["x"])
    pipeline.add_dynamic_item(lambda x: x * 2, takes="x", provides="doubled")
    pipeline.set_output_keys({"renamed": "doubled"})
    assert pipeline({"x": 2}) == {"renamed": 4}


def test_forward_reference():
    # Item added before its dependency exists.
    pipeline = DataPipeline(["x"])
    pipeline.add_dynamic_item(lambda m: m + 1, takes="mid", provides="final")
    pipeline.add_dynamic_item(lambda x: x * 10, takes="x", provides="mid")
    pipeline.set_output_keys(["final"])
    assert pipeline({"x": 1}) == {"final": 11}


def test_unaccounted_key_raises():
    pipeline = DataPipeline(["x"])
    pipeline.add_dynamic_item(lambda m: m, takes="missing", provides="out")
    pipeline.set_output_keys(["out"])
    with pytest.raises((RuntimeError, KeyError)):
        pipeline({"x": 1})


def test_compute_specific():
    pipeline = DataPipeline(["x"])
    pipeline.add_dynamic_item(lambda x: x + 1, takes="x", provides="y")
    pipeline.add_dynamic_item(lambda y: y * 2, takes="y", provides="z")
    pipeline.set_output_keys(["z"])
    assert pipeline.compute_specific(["y"], {"x": 1}) == {"y": 2}
