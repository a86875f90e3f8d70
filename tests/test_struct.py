"""Struct container: attribute access, nesting, tree, save/load roundtrip,
flatten (rt_struct.py:77, rt_sds.py nested dirs + sds_flatten)."""

from __future__ import annotations

import pytest

from riptable_spark.struct import Struct


@pytest.fixture()
def st(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    return Struct({"scale": 2.5, "name": "run1", "data": df, "sub": {"inner": df, "n": 7}})


def test_attribute_and_item_access(st):
    assert st.scale == 2.5 and st["name"] == "run1"
    assert st.sub.n == 7
    assert st["sub"]["inner"].count() == 2
    with pytest.raises(AttributeError):
        st.nope


def test_insertion_order_and_multiselect(st):
    assert list(st.keys()) == ["scale", "name", "data", "sub"]
    sel = st[["name", "scale"]]
    assert isinstance(sel, Struct) and list(sel.keys()) == ["name", "scale"]


def test_tree_render(st):
    t = st.tree()
    assert "data [2 cols]" in t and "sub" in t and "n = 7" in t


def test_save_load_roundtrip(spark, st, tmp_path):
    root = str(tmp_path / "stree")
    st.save(root)
    back = Struct.load(spark, root)
    assert list(back.keys()) == ["scale", "name", "data", "sub"]
    assert back.scale == 2.5 and back.sub.n == 7
    assert sorted(r["v"] for r in back.data.collect()) == ["a", "b"]
    assert sorted(r["v"] for r in back.sub.inner.collect()) == ["a", "b"]


def test_flatten(st):
    flat = st.flatten()
    assert set(flat.keys()) == {"scale", "name", "data", "sub_inner", "sub_n"}
    assert flat.sub_n == 7


def test_member_name_validation(spark):
    s = Struct()
    with pytest.raises(ValueError):
        s["not a name"] = 1
    with pytest.raises(TypeError):
        s["f"] = object()


def test_extract_indexing_parity(st):
    """rt_struct.py:752 _extract_indexing colspec forms: int position,
    positional slice, lists of names/positions/booleans, duplicate and
    tuple rejection, plus dotted nested paths."""
    names = list(st.keys())  # ["scale", "name", "data", "sub"]
    assert st[0] == st[names[0]]
    sliced = st[1:3]
    assert list(sliced.keys()) == names[1:3]
    assert list(st[["scale", "name"]].keys()) == ["scale", "name"]
    assert list(st[[0, 3]].keys()) == [names[0], names[3]]
    mask = [True, False, False, True]
    assert list(st[mask].keys()) == [names[0], names[3]]
    with pytest.raises(IndexError):
        st[["scale", "scale"]]  # duplicates (rt_struct.py:832)
    with pytest.raises(IndexError):
        st["scale", "name"]  # tuple → no row axis (rt_struct.py:805)
    with pytest.raises(IndexError):
        st[[]]
    with pytest.raises(IndexError):
        st[[True, False]]  # wrong-length bool mask
    # nested path ≡ attribute chain
    assert st["sub.n"] == st.sub.n == 7
