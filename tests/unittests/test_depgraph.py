import pytest

from speechbrain_tpu.utils.depgraph import (
    CircularDependencyError,
    DependencyGraph,
)


def test_topological_order():
    g = DependencyGraph()
    for key in "abcde":
        g.add_node(key)
    g.add_edge("b", "a")
    g.add_edge("c", "b")
    g.add_edge("d", "c")
    g.add_edge("e", "d")
    order = [n.key for n in g.get_evaluation_order()]
    assert order.index("a") < order.index("b") < order.index("c")
    assert order.index("d") < order.index("e")


def test_selected_keys():
    g = DependencyGraph()
    g.add_edge("b", "a")
    g.add_edge("c", "b")
    g.add_edge("z", "y")  # independent chain
    order = [n.key for n in g.get_evaluation_order(selected_keys=["c"])]
    assert order == ["a", "b", "c"]


def test_cycle_detection():
    g = DependencyGraph()
    g.add_edge("a", "b")
    g.add_edge("b", "a")
    assert not g.is_valid()
    with pytest.raises(CircularDependencyError):
        list(g.get_evaluation_order())


def test_duplicate_node_raises():
    g = DependencyGraph()
    g.add_node("a")
    with pytest.raises(ValueError):
        g.add_node("a")


def test_implicit_node_then_explicit():
    g = DependencyGraph()
    g.add_edge("b", "a")  # creates a, b implicitly
    g.add_node("a", data="payload")  # now attach data
    nodes = {n.key: n for n in g.get_evaluation_order()}
    assert nodes["a"].data == "payload"
