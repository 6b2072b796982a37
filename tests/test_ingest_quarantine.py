"""ingest_quarantine: corrupted JSONL lines route to the quarantine
side-channel instead of failing the job; adversarial text (braces,
newlines, unicode) neither breaks the line framing nor leaks past the
structural prefilter."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.sources.textio import (
    QUARANTINE_MOD,
    ingest_quarantine_rollup,
)


def test_quarantine_routing(ray_session, tmp_path):
    import ray.data as rd

    n = 3 * QUARANTINE_MOD + 7
    texts = []
    for i in range(n):
        # hostile payloads: closing braces, embedded newlines, unicode
        texts.append("x}" * (i % 5) + "línea\nrota}" + "y" * (i % 11))
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en" if i % 2 else "de" for i in range(n)]),
        }
    )
    out = ingest_quarantine_rollup(
        rd.from_arrow(t).repartition(4), str(tmp_path / "dump")
    ).to_pandas().set_index("lang")

    bad = (np.arange(n) % QUARANTINE_MOD == 0).sum()
    assert out.loc["__quarantined__", "n_docs"] == bad
    keep = np.arange(n) % QUARANTINE_MOD != 0
    for lang, sel in (("en", np.arange(n) % 2 == 1), ("de", np.arange(n) % 2 == 0)):
        m = keep & sel
        assert out.loc[lang, "n_docs"] == m.sum()
        assert out.loc[lang, "sum_chars"] == sum(
            len(texts[i]) for i in np.flatnonzero(m))
