"""Unique-name codec round-trip + depth/parent semantics (SURVEY N2/N6/N11)."""
from hypothesis import given, strategies as st

from olap_xtrctr_spark import naming

KEY = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           whitelist_characters=" #_-"),
    min_size=1, max_size=12)


def test_encode_parse_roundtrip():
    u = naming.encode("Dim Customer", "Geografía", "Region", ["2", "7"])
    assert u == "[Dim Customer].[Geografía].[Region].&[2].&[7]"
    p = naming.parse(u)
    assert (p.dimension, p.hierarchy, p.level1) == (
        "Dim Customer", "Geografía", "Region")
    assert p.keys == ["2", "7"]
    assert p.depth == 2
    assert naming.depth(u) == 2


@given(keys=st.lists(KEY, min_size=1, max_size=4))
def test_roundtrip_property(keys):
    u = naming.encode("D", "H", "L1", keys)
    p = naming.parse(u)
    assert p.keys == keys
    assert naming.depth(u) == len(keys)


def test_parent_prefix_invariant():
    parent = naming.encode("D", "H", "L1", ["a"])
    child = naming.encode("D", "H", "L1", ["a", "b"])
    assert child.startswith(parent)
    assert child != parent


def test_parse_without_level_segment():
    p = naming.parse("[Dim].[Hier].&[5]")
    assert p.level1 is None
    assert p.keys == ["5"]
