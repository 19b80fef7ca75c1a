import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def log(m): print(m, file=sys.stderr, flush=True)

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from kmer_mapper_tpu import oracle, pipeline
from kmer_mapper_tpu.index import kmer_index as ki
from kmer_mapper_tpu.models.mapper import KmerMapper, default_config
from pathlib import Path

tmp = Path("/tmp/kmt_scale")
reads_path = tmp / "reads10m.fa"  # exists from previous run
rng = np.random.default_rng(0)
# smaller index to isolate
with open(reads_path, "rb") as f:
    head = f.read(4 << 20)
sample_bases = np.frombuffer(b"".join(l for l in head.split(b"\n") if l and not l.startswith(b">")), np.uint8)
read_kmers = oracle.kmer_hashes(oracle.encode_bytes(sample_bases[: 2 << 20]), 31)
entry = np.unique(np.concatenate([rng.integers(0, 1 << 62, 2_000_000, dtype=np.uint64), rng.choice(read_kmers, 2_000_000)]))
nodes = rng.integers(0, 3_000_000, len(entry)).astype(np.int32)
index = ki.TpuKmerIndex.from_entries(entry, nodes)
log(f"index {index.n_unique/1e6:.1f}M unique")

chunk_size = 4 << 20
config = default_config(k=31, buf=chunk_size, max_reads=max(1024, chunk_size // 32))
mapper = KmerMapper(index, config)
import os
use_prefetch = os.environ.get("USE_PREFETCH", "0") == "1"
packed_iter = pipeline.packed_chunk_iterator(str(reads_path), config, chunk_size)
if use_prefetch:
    packed_iter = pipeline.prefetch(packed_iter, depth=4)
log(f"prefetch={use_prefetch}")

t0 = time.perf_counter()
n = 0
t_host = 0.0
t_feed = 0.0
last = time.perf_counter()
for item in packed_iter:
    now = time.perf_counter()
    t_host += now - last
    mapper.map_chunk(item[0], item[1], item[2], item[4])
    last = time.perf_counter()
    t_feed += last - now
    n += 1
    if n in (1, 5, 20, 40, 80, 160, 240, 320):
        log(f"chunk {n}: cum host {t_host:.1f}s feed {t_feed:.1f}s total {time.perf_counter()-t0:.1f}s")
t = time.perf_counter()
km = mapper.n_kmers_mapped
log(f"sync: {time.perf_counter()-t:.1f}s; {km} kmers in {time.perf_counter()-t0:.1f}s = {km/(time.perf_counter()-t0)/1e6:.1f} Mk/s")
log(f"host iter time {t_host:.1f}s, feed(dispatch) {t_feed:.1f}s")
