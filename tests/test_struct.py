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
