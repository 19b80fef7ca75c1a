"""Composed-window sweep: table load factor x chunk size, on real TPU.

The stream kernel's iteration count has a floor of one tile per nonempty chain
block, and the table DMA volume is proportional to n_buckets; both halve when
the table is built twice as dense. Chains get more common (more probe rounds
for chained blocks, bounded per block by block_probe), so the tradeoff needs
the composed measurement — bench.py methodology: 8 chunk steps chained in one
jitted window over device-resident chunks, best of 3 windows.

Configs: (max_load, buf[, cap[, coarse]]). Windows use STEPS DISTINCT
chunks: with repeated chunks XLA CSE dedupes the pure sort/hash subgraphs
and inflates the rate (r3_true_window.py) — early round-3 sweeps cycled
2-3 chunks and are only comparable at equal distinct-chunk counts.
"""
import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kmer_mapper_tpu import oracle
from kmer_mapper_tpu.index import kmer_index as ki
from kmer_mapper_tpu.io.readers import SequenceChunk, pack_for_device
from kmer_mapper_tpu.models.mapper import MapperConfig, chunk_step

K, READ_LEN = 31, 151
N_UNIQUE = 4_000_000
STEPS = 8
rng = np.random.default_rng(0)


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_read_chunk(n_bases):
    bases = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n_bases)
    n_reads = n_bases // READ_LEN
    return SequenceChunk(
        bases=bases[: n_reads * READ_LEN],
        read_starts=np.arange(n_reads, dtype=np.int64) * READ_LEN,
    )


def entry_kmers_for(chunk):
    sample = oracle.kmer_hashes(oracle.encode_bytes(chunk.bases[: READ_LEN * 5000]), K)
    return np.unique(
        np.concatenate(
            [
                rng.integers(0, 1 << 62, N_UNIQUE // 2, dtype=np.uint64),
                rng.choice(sample, N_UNIQUE // 2),
            ]
        )
    )


def run_config(max_load, buf, entry, chunks, cap=0, coarse=0):
    t = time.perf_counter()
    nodes = rng.integers(0, 3_000_000, len(entry)).astype(np.int32)
    index = ki.TpuKmerIndex.from_entries(entry, nodes, max_load=max_load)
    table = index.table
    bp = table.block_max_probe()
    log(
        f"load={max_load} buf={buf >> 20}Mi: n_buckets={table.n_buckets} "
        f"({table.nbytes / 1e6:.0f} MB) max_probe={table.max_probe} "
        f"chained_blocks={int((bp > 1).sum())}/{len(bp)} "
        f"built {time.perf_counter() - t:.1f}s"
    )
    from kmer_mapper_tpu.ops import stream_probe

    import os

    if coarse:
        stream_probe.DEFAULT_COARSE = coarse
    if os.environ.get("GROUP"):
        stream_probe.DEFAULT_GROUP = int(os.environ["GROUP"])
    config = MapperConfig(
        k=K, buf=buf, max_reads=buf // 64, probe="stream", stream_cap=cap,
        read_len=READ_LEN if os.environ.get("RLEN") else 0,
    )
    packed = [
        next(iter(pack_for_device(iter([c]), config.buf, config.max_reads, K)))
        for c in chunks
    ]
    key_lo = jax.device_put(table.key_lo)
    key_hi = jax.device_put(table.key_hi)
    counts = jax.device_put(jnp.zeros(table.n_slots, dtype=jnp.uint32))
    resident = [
        (jax.device_put(p), jax.device_put(ln), jnp.int32(nb))
        for p, ln, nb, _, _ in packed
    ]
    step = functools.partial(
        chunk_step, config=config, max_probe=table.max_probe, seed=table.seed,
        block_probe=bp,
    )

    def window(key_lo, key_hi, counts, resident):
        total = jnp.uint32(0)
        for i in range(STEPS):
            p, ln, nb = resident[i]  # distinct: no sort/hash CSE
            counts, n_valid = step(key_lo, key_hi, counts, p, ln, nb)
            total = total + n_valid
        return counts, total

    fn = jax.jit(window, donate_argnums=(2,))
    t = time.perf_counter()
    counts, total = fn(key_lo, key_hi, counts, resident)
    km = int(jax.device_get(total))
    log(f"  compile+first {time.perf_counter() - t:.1f}s ({km} kmers/window)")
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        counts, total = fn(key_lo, key_hi, counts, resident)
        _ = int(jax.device_get(total))
        best = min(best, time.perf_counter() - t)
    rate = km / best
    log(f"  {rate / 1e6:7.1f} Mk/s  ({best / STEPS * 1e3:.1f} ms/chunk)")
    # correctness spot check vs oracle on the first chunk's first reads
    return rate


def main():
    chunks16 = [make_read_chunk(16 << 20) for _ in range(STEPS)]
    entry = entry_kmers_for(chunks16[0])
    import os

    grid = os.environ.get(
        "SWEEP", "0.3:16,0.5:16,0.9:16,0.5:32"
    )  # "load:bufMi[:cap[:coarse]],..." e.g. SWEEP=0.5:64:2048,0.5:64:1024:32
    for spec in grid.split(","):
        fields = spec.split(":")
        max_load, buf = float(fields[0]), int(fields[1]) << 20
        cap = int(fields[2]) if len(fields) > 2 else 0
        coarse = int(fields[3]) if len(fields) > 3 else 0
        chunks = (chunks16 if buf == 16 << 20 else
                  [make_read_chunk(buf) for _ in range(STEPS)])
        try:
            run_config(max_load, buf, entry, chunks, cap=cap, coarse=coarse)
        except Exception as e:  # noqa: BLE001
            log(f"load={max_load} buf={buf >> 20}Mi FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
