"""Generate the E1 golden-embedding fixture on a torch-capable machine.

This container has no torch/torchvision (environment charter), so the
real ResNet-50 branch of sources/images.with_embeddings
(/root/reference/vector_embeddings.py:12-35, 65-94 semantics: seed 42,
resize 224×224, ImageNet normalization, pretrained ResNet-50 with the
final FC layer stripped → 2048-d penultimate features) can't execute
here. Run THIS script anywhere torch is installed:

    python tools/make_resnet_golden.py

It embeds every committed fixture image through the SAME code path the
engine ships (sources.images._try_torch_embedder — no reimplementation,
so the fixture pins the branch that actually runs in production) and
writes ``fixtures/golden/resnet50_embeddings.parquet`` with columns
(filename, embedding ARRAY<FLOAT>). Commit the parquet; the parity test
(tests/test_ingestion.py::test_resnet_golden_fixture_parity) then stops
skipping and asserts the Spark pipeline reproduces these vectors
bit-close (atol 1e-5 — cuDNN/BLAS kernels may differ across machines at
that level; ResNet-50 eval-mode features are deterministic per backend).
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

GOLDEN_DIR = os.path.join(ROOT, "fixtures", "golden")
GOLDEN_PARQUET = os.path.join(GOLDEN_DIR, "resnet50_embeddings.parquet")


def main() -> None:
    import glob

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from acorn_hybrid_vector_search_spark.sources.images import (
        EMBED_DIM_DEFAULT,
        _try_torch_embedder,
    )

    embed = _try_torch_embedder(EMBED_DIM_DEFAULT)
    if embed is None:
        raise SystemExit(
            "torch/torchvision not importable here — run this script on a "
            "torch-capable machine (see module docstring)."
        )
    paths = sorted(glob.glob(os.path.join(ROOT, "fixtures/abo/images/*/*.jpg")))
    if not paths:
        raise SystemExit("no fixture images found under fixtures/abo/images")
    contents = pd.Series([open(p, "rb").read() for p in paths])
    vecs = embed(contents)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    table = pa.table(
        {
            "filename": [p.rsplit("/", 1)[-1] for p in paths],
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        }
    )
    pq.write_table(table, GOLDEN_PARQUET)
    print(f"wrote {len(paths)} golden embeddings to {GOLDEN_PARQUET}")


if __name__ == "__main__":
    main()
