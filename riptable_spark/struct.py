"""Struct: heterogeneous named-member container.

Reference parity: rt_struct.py:77 — Struct is the root of riptable's
class design: an insertion-ordered container of named members that may be
scalars, arrays/Datasets, or nested Structs, with attribute-style access
and recursive SDS save/load.

Spark-first shape: members are scalars, Dataset/DataFrame leaves, or
nested Structs. On disk a Struct is a directory tree — one parquet
dataset per table leaf, one `_scalars.json` per level — the layout
`sources.io.save_struct/load_struct` already writes, now with nesting and
scalars. That matches the reference's nested-SDS-directory format
(rt_sds.py nested Struct dirs) while staying a plain, tool-readable
parquet tree (partition discovery, pruning and parallel reads all work
per-leaf at 100 TB; no monolithic file).
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession

_SCALARS_FILE = "_scalars.json"


class Struct:
    """Insertion-ordered named members: scalars, DataFrames/Datasets,
    nested Structs. ``s.member`` and ``s['member']`` both work, as in the
    reference (rt_struct.py:752 _extract_indexing)."""

    def __init__(self, items: dict[str, Any] | None = None):
        object.__setattr__(self, "_items", {})
        for k, v in (items or {}).items():
            self[k] = v

    # -- mapping protocol ------------------------------------------------
    def __getitem__(self, key) -> Any:
        """Member access with the reference's colspec forms
        (rt_struct.py:752 _extract_indexing / :805 __getitem__):
        name, int position, positional slice, list of names / positions /
        booleans (multi-member specs return a shallow-copy sub-Struct;
        duplicates raise IndexError), plus dotted nested paths
        ('a.b.c' ≡ st.a.b.c). Tuples raise IndexError — Struct has no
        row axis (rt_struct.py:805)."""
        if isinstance(key, tuple) or key is None:
            raise IndexError(
                "Can only index Struct as st[c], where c is a member name, "
                "position, slice, or list — Struct has no row axis"
            )
        names = list(self._items)
        if isinstance(key, bool):
            raise TypeError("Cannot index Struct with a bare bool.")
        if isinstance(key, int):
            return self._items[names[key]]
        if isinstance(key, slice):
            return Struct({k: self._items[k] for k in names[key]})
        if isinstance(key, list):
            if not key:
                raise IndexError("Error in member slice; empty list.")
            if isinstance(key[0], bool):
                if len(key) != len(names):
                    raise IndexError(
                        f"boolean member mask length {len(key)} != n members {len(names)}"
                    )
                picked = [n for n, keep in zip(names, key) if keep]
            elif isinstance(key[0], int):
                picked = [names[i] for i in key]
            else:
                picked = [str(k) for k in key]
            if len(set(picked)) < len(picked):
                raise IndexError("Cannot index cols with duplicates.")
            return Struct({k: self._items[k] for k in picked})
        if isinstance(key, str) and "." in key:
            node: Any = self
            for part in key.split("."):
                node = node[part] if isinstance(node, Struct) else getattr(node, part)
            return node
        return self._items[key]

    def __setitem__(self, key: str, value: Any) -> None:
        if not key.isidentifier():
            raise ValueError(f"Struct member names must be identifiers, got {key!r}")
        from .dataset import Dataset

        if isinstance(value, dict):
            value = Struct(value)
        if not isinstance(value, (Struct, DataFrame, Dataset, int, float, str, bool, bytes, type(None), list)):
            raise TypeError(f"unsupported Struct member type: {type(value).__name__}")
        self._items[key] = value

    def __delitem__(self, key: str) -> None:
        del self._items[key]

    def __contains__(self, key: str) -> bool:
        return key in self._items

    def __len__(self) -> int:
        return len(self._items)

    def __iter__(self) -> Iterator[str]:
        return iter(self._items)

    def keys(self):
        return self._items.keys()

    def values(self):
        return self._items.values()

    def items(self):
        return self._items.items()

    # -- attribute access ------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self._items[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        else:
            self[name] = value

    def __repr__(self) -> str:
        from .dataset import Dataset

        parts = []
        for k, v in self._items.items():
            if isinstance(v, Struct):
                parts.append(f"{k}: Struct({len(v)})")
            elif isinstance(v, (DataFrame, Dataset)):
                df = v.df if isinstance(v, Dataset) else v
                parts.append(f"{k}: Dataset[{len(df.columns)} cols]")
            else:
                parts.append(f"{k}: {v!r}")
        return "Struct({" + ", ".join(parts) + "})"

    # -- tree walk (rt_struct tree / sds_tree) ---------------------------
    def tree(self, name: str = "Struct", _indent: str = "") -> str:
        from .dataset import Dataset

        lines = [f"{_indent}{name}"]
        for k, v in self._items.items():
            if isinstance(v, Struct):
                lines.append(v.tree(k, _indent + "  "))
            elif isinstance(v, (DataFrame, Dataset)):
                df = v.df if isinstance(v, Dataset) else v
                lines.append(f"{_indent}  {k} [{len(df.columns)} cols]")
            else:
                lines.append(f"{_indent}  {k} = {v!r}")
        return "\n".join(lines)

    # -- persistence (rt_sds nested dirs) --------------------------------
    def save(self, root: str, mode: str = "overwrite") -> None:
        """Recursive directory-tree save: table leaves → parquet dirs,
        scalars → one small json per level. Each leaf is independently
        readable/prunable — the cluster analogue of per-member SDS files."""
        from .dataset import Dataset
        from .sources.io import save_dataset

        os.makedirs(root, exist_ok=True)
        scalars: dict[str, Any] = {}
        for k, v in self._items.items():
            if isinstance(v, Struct):
                v.save(os.path.join(root, k), mode=mode)
            elif isinstance(v, (DataFrame, Dataset)):
                df = v.df if isinstance(v, Dataset) else v
                save_dataset(df, os.path.join(root, k), mode=mode)
            else:
                scalars[k] = v
        # always write the manifest: it records member ORDER and which
        # names are scalars, so load() restores insertion order
        with open(os.path.join(root, _SCALARS_FILE), "w") as f:
            json.dump({"order": list(self._items), "scalars": scalars}, f)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "Struct":
        """Inverse of save(). Directories with parquet files load as
        DataFrames (schema from footers, data lazy); directories with a
        manifest load as nested Structs."""
        manifest_path = os.path.join(root, _SCALARS_FILE)
        order: list[str] = []
        scalars: dict[str, Any] = {}
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                m = json.load(f)
            order, scalars = m.get("order", []), m.get("scalars", {})
        out = cls()
        seen = set()
        for name in order:
            seen.add(name)
            if name in scalars:
                out[name] = scalars[name]
            else:
                out[name] = cls._load_member(spark, os.path.join(root, name))
        # tolerate members added to the tree out-of-band
        for name in sorted(os.listdir(root)):
            sub = os.path.join(root, name)
            if name not in seen and os.path.isdir(sub):
                out[name] = cls._load_member(spark, sub)
        return out

    @classmethod
    def _load_member(cls, spark: SparkSession, path: str):
        if os.path.exists(os.path.join(path, _SCALARS_FILE)):
            return cls.load(spark, path)
        return spark.read.parquet(path)

    def flatten(self, sep: str = "_") -> "Struct":
        """sds_flatten analogue (rt_sds.py sds_flatten): collapse nested
        Structs into one flat Struct with sep-joined member names."""
        flat = Struct()
        for k, v in self._items.items():
            if isinstance(v, Struct):
                for ik, iv in v.flatten(sep).items():
                    flat[f"{k}{sep}{ik}"] = iv
            else:
                flat[k] = v
        return flat
