"""chunk_size_histogram: normalized chunking narrows the size spread.

The 2020 paper's normalization levels trade cut-point freedom for size
concentration around avg_size: at NC0 sizes spread across [min, max],
at NC3 they cluster tightly around avg.  Pin that ordering via the
byte-weighted share of the two buckets straddling avg_size, plus basic
invariants (bounds, totals conserved across levels).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.cdc import ChunkerConfig
from fastcdc_rs_ray.stages.chunk import chunk_size_histogram

CFG = ChunkerConfig(min_size=256, avg_size=1024, max_size=4096)


def _conv_ds(n_docs: int = 200, doc_len: int = 30000, blocks: int = 4):
    import ray.data as rd

    rng = np.random.default_rng(11)
    payloads = [rng.integers(0, 256, size=doc_len, dtype=np.uint8).tobytes()
                for _ in range(n_docs)]
    tbl = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(n_docs)], pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
    })
    return rd.from_arrow(tbl).repartition(blocks)


def test_normalization_narrows_spread(ray_session):
    ds = _conv_ds()
    t = chunk_size_histogram(ds, norm_levels=(0, 3), base_cfg=CFG).to_pydict()
    rows = list(zip(t["norm_level"], t["bucket_lo"], t["n_chunks"], t["bytes"]))
    total_bytes = {lvl: sum(b for l_, bl, n, b in rows if l_ == lvl)
                   for lvl in (0, 3)}
    # every chunk volume is identical input bytes, fully covered
    assert total_bytes[0] == total_bytes[3]
    # no bucket above max_size; sub-min chunks are only the per-doc final
    # runt (reference K4 semantics), so at most one per doc per level
    for lvl in (0, 3):
        assert max(bl for l_, bl, n, b in rows if l_ == lvl) <= CFG.max_size
        runts = sum(n for l_, bl, n, b in rows
                    if l_ == lvl and bl < CFG.min_size)
        assert runts <= 200
    # byte share in the avg-straddling buckets (512 and 1024) rises with NC
    def share(lvl):
        core = sum(b for l_, bl, n, b in rows
                   if l_ == lvl and bl in (512, 1024))
        return core / total_bytes[lvl]
    assert share(3) > share(0)


def test_histogram_partition_invariant(ray_session):
    a = chunk_size_histogram(_conv_ds(blocks=1), norm_levels=(1,),
                             base_cfg=CFG).to_pydict()
    b = chunk_size_histogram(_conv_ds(blocks=7), norm_levels=(1,),
                             base_cfg=CFG).to_pydict()
    assert a == b
