"""Pickled CounterKmerIndex interop (reference ``util.py:63-66`` fallback).

The fakes below replicate the reference dependency class tree
(``graph_kmer_index.CounterKmerIndex`` holding an ``npstructures.Counter``
whose ``_keys`` is a RaggedArray-like wrapper) closely enough that pickle
stores the same module/qualname strings and attribute layout the real
packages would produce; the loader must resolve them without the packages
installed.
"""
from __future__ import annotations

import pickle
import sys
import types

import numpy as np
import pytest

from kmer_mapper_tpu import oracle
from kmer_mapper_tpu.index.kmer_index import load_index
from kmer_mapper_tpu.index.pickled import is_pickle_file, load_pickled_counter_index


def _fake_module(name: str) -> types.ModuleType:
    # register the whole package chain so pickle's __import__ resolves it
    parts = name.split(".")
    for i in range(1, len(parts) + 1):
        prefix = ".".join(parts[:i])
        mod = sys.modules.get(prefix)
        if mod is None:
            mod = types.ModuleType(prefix)
            mod.__path__ = []  # mark as package
            sys.modules[prefix] = mod
        if i > 1:
            setattr(sys.modules[".".join(parts[: i - 1])], parts[i - 1], mod)
    return sys.modules[name]


def _fake_class(module: str, name: str, ns=None) -> type:
    mod = _fake_module(module)
    cls = type(name, (object,), dict(ns or {}))
    cls.__module__ = module
    setattr(mod, name, cls)
    return cls


@pytest.fixture
def fake_tree():
    RaggedArray = _fake_class("npstructures.raggedarray", "RaggedArray")
    Counter = _fake_class("npstructures.hashtable", "Counter")
    CounterKmerIndex = _fake_class("graph_kmer_index.kmer_counter", "CounterKmerIndex")

    def build(keys: np.ndarray, kmers=None, nodes=None):
        ragged = RaggedArray()
        ragged._data = np.asarray(keys, dtype=np.uint64)
        ragged._shape = np.array([len(keys)])
        counter = Counter()
        counter._keys = ragged
        counter._values = np.zeros(len(keys), dtype=np.int64)
        counter._mod = np.uint64(17)
        index = CounterKmerIndex()
        index.counter = counter
        if kmers is not None:
            index._kmers = np.asarray(kmers, dtype=np.uint64)
            index._nodes = np.asarray(nodes, dtype=np.int64)  # real writer: int64
        return index

    return build


def test_counter_only_pickle_roundtrip(tmp_path, fake_tree):
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 1 << 62, 500, dtype=np.uint64))
    path = tmp_path / "counter_index.pkl"
    with open(path, "wb") as f:
        pickle.dump(fake_tree(keys), f)
    assert is_pickle_file(path)

    index = load_index(str(path))
    assert index.n_unique == len(keys)
    # count: each key hit once, plus misses that must not count
    queries = np.concatenate([keys, rng.integers(0, 1 << 62, 1000, dtype=np.uint64)])
    from kmer_mapper_tpu.index.layout import query_table

    slots = query_table(index.table, queries)
    hit = slots >= 0
    assert hit[: len(keys)].all()
    got_kmers, _ = index.kmer_counts(np.zeros(index.table.n_slots, dtype=np.uint32))
    assert np.array_equal(np.sort(got_kmers), keys)


def test_counter_with_nodes_pickle(tmp_path, fake_tree):
    rng = np.random.default_rng(4)
    kmers = np.unique(rng.integers(0, 1 << 62, 300, dtype=np.uint64))
    entry_kmers = np.concatenate([kmers, rng.choice(kmers, 60)])  # duplicate entries
    nodes = rng.integers(0, 50, len(entry_kmers)).astype(np.int64)
    path = tmp_path / "counter_nodes.pkl"
    with open(path, "wb") as f:
        pickle.dump(fake_tree(kmers, kmers=entry_kmers, nodes=nodes), f)

    index = load_index(str(path))
    # node conversion works: count each kmer once, expect per-node entry counts
    slot_counts = np.zeros(index.table.n_slots, dtype=np.uint32)
    from kmer_mapper_tpu.index.layout import query_table

    slots = query_table(index.table, kmers)
    np.add.at(slot_counts, slots, 1)
    got = index.node_counts(slot_counts)
    want = np.bincount(nodes, minlength=int(nodes.max()) + 1).astype(np.uint32)
    assert np.array_equal(got, want)


def test_unknown_class_refused(tmp_path):
    path = tmp_path / "evil.pkl"
    with open(path, "wb") as f:
        pickle.dump({"f": print}, f)  # builtins.print: not an allowed class path
    with pytest.raises(Exception):
        load_pickled_counter_index(str(path))


def test_no_keys_raises(tmp_path, fake_tree):
    # an allowed class tree that carries no _keys arrays anywhere
    idx = fake_tree(np.array([1], dtype=np.uint64))
    idx.counter._keys = None
    path = tmp_path / "empty.pkl"
    with open(path, "wb") as f:
        pickle.dump(idx, f)
    with pytest.raises(ValueError, match="no counter keys"):
        load_pickled_counter_index(str(path))


def test_counter_keys_missing_from_entries_still_countable(tmp_path, fake_tree):
    """Counter keys with no (kmer, node) entry must remain probeable and
    appear in the counter view (reference counter semantics)."""
    rng = np.random.default_rng(6)
    entry_kmers = np.unique(rng.integers(0, 1 << 62, 100, dtype=np.uint64))
    nodes = rng.integers(0, 20, len(entry_kmers)).astype(np.int64)
    extra = np.unique(rng.integers(0, 1 << 62, 40, dtype=np.uint64))
    extra = np.setdiff1d(extra, entry_kmers)
    all_keys = np.union1d(entry_kmers, extra)
    path = tmp_path / "c.pkl"
    with open(path, "wb") as f:
        pickle.dump(fake_tree(all_keys, kmers=entry_kmers, nodes=nodes), f)
    index = load_index(str(path))
    assert index.n_unique == len(all_keys)
    from kmer_mapper_tpu.index.layout import query_table

    slots = query_table(index.table, extra)
    assert (slots >= 0).all()  # extra keys probeable
    # and they contribute to no node
    counts = np.zeros(index.table.n_slots, dtype=np.uint32)
    np.add.at(counts, slots, 1)
    assert index.node_counts(counts).sum() == 0


class _EvilNumpyCall:
    """Pickles to a REDUCE of numpy.save — a side-effecting numpy callable
    that the shim's reconstruction allowlist must refuse."""

    def __reduce__(self):
        return (np.save, (str("/tmp/pwn"), np.arange(3)))


def test_numpy_namespace_restricted(tmp_path):
    path = tmp_path / "evil2.pkl"
    with open(path, "wb") as f:
        pickle.dump(_EvilNumpyCall(), f)
    with pytest.raises(Exception, match="refus"):
        load_pickled_counter_index(str(path))
    assert not (tmp_path / "pwn.npy").exists()
