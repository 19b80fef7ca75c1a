"""Byte-level emulation of the REAL graph_kmer_index writers.

The reference consumes production artifacts written by ``graph_kmer_index``
and ``shared_memory_wrapper`` (reference ``util.py:38-68``; array fields read
at ``mapper.pyx:22-29``). Those packages are not installable here (no
network), so this module replicates their writers' on-disk output from the
published packages' behavior, so ``load_index`` is validated against the real
field names, dtypes, scalar shapes, and container formats rather than only
against files this repo itself wrote:

* ``CollisionFreeKmerIndex.to_file`` — ``np.savez`` with PLAIN field names
  (``hashes_to_index``, ``n_kmers``, ``nodes``, ``ref_offsets``, ``kmers``,
  ``modulo``, ``frequencies``, ``allele_frequencies``; the leading-underscore
  attribute names are stripped by the writer), 0-d integer ``modulo``,
  ``.npz`` appended by numpy itself. Attributes that are ``None`` (an index
  saved before frequencies were computed) become 0-d OBJECT arrays that
  require allow_pickle on read.
* ``CollisionFreeKmerIndex.from_file`` — tries ``file_name + ".npz"`` before
  ``file_name``: production configs pass EXTENSIONLESS paths.
* ``MinimalKmerIndex.to_file`` — the 5-field subset (no frequencies /
  ref_offsets / allele_frequencies).
* ``shared_memory_wrapper.to_file`` — a PLAIN PICKLE whose file name is
  conventionally suffixed ``.npz`` without being a zip archive; used for both
  pickled ``CounterKmerIndex`` files (``util.py:63-66``) and ``IndexBundle``
  files (``util.py:51-53``). Class paths inside the pickles are the real
  packages' module paths (``graph_kmer_index.*``, ``npstructures.*``).

Where the real dtype choice is not pinned by the reference's usage sites, the
writers take a ``wide`` flag: the pre-``convert_to_int32()`` 64-bit layout
(what ``from_flat_kmers`` writes) vs the post-conversion 32-bit layout — the
loader must accept both, since ``convert_to_int32`` happens after load
(``util.py:42-43``).
"""
from __future__ import annotations

import pickle
import sys
import types

import numpy as np


def _fake_module(name: str) -> types.ModuleType:
    parts = name.split(".")
    for i in range(1, len(parts) + 1):
        prefix = ".".join(parts[:i])
        mod = sys.modules.get(prefix)
        if mod is None:
            mod = types.ModuleType(prefix)
            mod.__path__ = []
            sys.modules[prefix] = mod
        if i > 1:
            setattr(sys.modules[".".join(parts[: i - 1])], parts[i - 1], mod)
    return sys.modules[name]


def _fake_class(module: str, name: str) -> type:
    mod = _fake_module(module)
    cls = getattr(mod, name, None)
    if cls is None:
        cls = type(name, (object,), {})
        cls.__module__ = module
        setattr(mod, name, cls)
    return cls


def write_collision_free_npz(
    path,
    arrays,
    *,
    wide: bool = True,
    with_ref_offsets: bool = True,
    allele_frequencies: str = "float",
    frequencies: bool = True,
):
    """Emulate ``CollisionFreeKmerIndex.to_file(path)``. ``path`` should be
    extensionless or end in ``.npz`` — numpy appends ``.npz`` exactly like the
    real writer's ``np.savez`` call. Returns the actual file path written.

    ``allele_frequencies``: "float" (a real KAGE index), "none" (attribute
    was None -> 0-d object array needing allow_pickle), or "absent".
    ``frequencies=False`` stores the attribute as a None object array.
    """
    n = len(arrays.kmers)
    idx_t = np.int64 if wide else np.int32
    fields = {
        "hashes_to_index": arrays.hashes_to_index.astype(idx_t),
        "n_kmers": arrays.n_kmers.astype(idx_t),
        "nodes": arrays.nodes.astype(np.uint32 if wide else np.int32),
        "kmers": arrays.kmers.astype(np.uint64),
        # np.savez coerces a python int to a 0-d int64 array — the real
        # writer passes self._modulo through unchanged
        "modulo": int(arrays.modulo),
    }
    if with_ref_offsets:
        fields["ref_offsets"] = np.arange(n, dtype=np.uint64) * np.uint64(7)
    if frequencies:
        fields["frequencies"] = arrays.frequencies.astype(np.uint16)
    else:
        fields["frequencies"] = np.array(None, dtype=object)
    if allele_frequencies == "float":
        fields["allele_frequencies"] = np.linspace(0, 1, n, dtype=np.float32)
    elif allele_frequencies == "none":
        fields["allele_frequencies"] = np.array(None, dtype=object)
    path = str(path)
    np.savez(path, **fields)
    return path if path.endswith(".npz") else path + ".npz"


def write_minimal_npz(path, arrays, *, wide: bool = True):
    """Emulate ``MinimalKmerIndex.to_file``: the 5-field subset."""
    idx_t = np.int64 if wide else np.int32
    path = str(path)
    np.savez(
        path,
        hashes_to_index=arrays.hashes_to_index.astype(idx_t),
        n_kmers=arrays.n_kmers.astype(idx_t),
        nodes=arrays.nodes.astype(np.uint32 if wide else np.int32),
        kmers=arrays.kmers.astype(np.uint64),
        modulo=int(arrays.modulo),
    )
    return path if path.endswith(".npz") else path + ".npz"


def make_real_kmer_index_obj(arrays):
    """A pickle-faithful ``graph_kmer_index`` ``CollisionFreeKmerIndex``
    instance: real module path, underscore attribute names, wide dtypes."""
    cls = _fake_class(
        "graph_kmer_index.collision_free_kmer_index", "CollisionFreeKmerIndex"
    )
    obj = cls()
    obj._hashes_to_index = arrays.hashes_to_index.astype(np.int64)
    obj._n_kmers = arrays.n_kmers.astype(np.int64)
    obj._nodes = arrays.nodes.astype(np.uint32)
    obj._ref_offsets = np.arange(len(arrays.kmers), dtype=np.uint64)
    obj._kmers = arrays.kmers.astype(np.uint64)
    obj._modulo = int(arrays.modulo)
    obj._frequencies = arrays.frequencies.astype(np.uint16)
    obj._allele_frequencies = None
    return obj


def make_real_counter_index_obj(keys, entry_kmers=None, entry_nodes=None):
    """A pickle-faithful ``CounterKmerIndex`` holding an ``npstructures``
    ``Counter`` whose ``_keys``/``_values`` are RaggedArray-wrapped (the real
    HashTable buckets both by ``key % mod``)."""
    RaggedArray = _fake_class("npstructures.raggedarray", "RaggedArray")
    Counter = _fake_class("npstructures.hashtable", "Counter")
    CounterKmerIndex = _fake_class("graph_kmer_index.kmer_counter", "CounterKmerIndex")

    keys = np.asarray(keys, dtype=np.uint64)
    mod = max(17, int(len(keys) // 2) | 1)
    order = np.argsort(keys % np.uint64(mod), kind="stable")
    bucketed = keys[order]
    lengths = np.bincount((keys % np.uint64(mod)).astype(np.int64), minlength=mod)

    def ragged(data):
        r = RaggedArray()
        r._data = data
        r._shape = lengths  # real RaggedShape is itself an object; lengths suffice
        return r

    counter = Counter()
    counter._keys = ragged(bucketed)
    counter._values = ragged(np.zeros(len(keys), dtype=np.int64))
    counter._mod = mod
    index = CounterKmerIndex()
    index.counter = counter
    if entry_kmers is not None:
        index._kmers = np.asarray(entry_kmers, dtype=np.uint64)
        index._nodes = np.asarray(entry_nodes, dtype=np.uint32)
    return index


def write_shared_memory_wrapper_file(path, obj):
    """Emulate ``shared_memory_wrapper.to_file``: plain pickle, file name
    suffixed ``.npz`` by convention. Returns the path written."""
    path = str(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    with open(path, "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
    return path


def write_index_bundle(path, arrays, *, as_object: bool = True, decoys: bool = True):
    """Emulate ``IndexBundle.to_file``: a shared_memory_wrapper pickle whose
    payload carries ``indexes["kmer_index"]`` (plus KAGE's other bundle
    members as decoys the loader must skip)."""
    kmer_index = make_real_kmer_index_obj(arrays)
    indexes = {"kmer_index": kmer_index}
    if decoys:
        VariantToNodes = _fake_class("obgraph.variant_to_nodes", "VariantToNodes")
        # obgraph is outside the stub allowlist on load — keep decoys in
        # allowlisted packages but index-shaped, to prove path-based selection
        Decoy = _fake_class("graph_kmer_index.flat_kmers", "FlatKmers")
        d = Decoy()
        d._kmers = np.array([1, 2, 3], dtype=np.uint64)
        d._nodes = np.array([9, 9, 9], dtype=np.uint32)
        indexes["helper_model"] = d
        del VariantToNodes
    if as_object:
        IndexBundle = _fake_class("graph_kmer_index.index_bundle", "IndexBundle")
        bundle = IndexBundle()
        bundle.indexes = indexes
        payload = bundle
    else:
        payload = indexes
    return write_shared_memory_wrapper_file(path, payload)
