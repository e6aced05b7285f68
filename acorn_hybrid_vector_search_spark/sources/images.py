"""S3/E1 — binary image scan + embedding extraction (multimodal ingest).

Reference: recursive ``rglob("*.jpg")`` + single-image torch ResNet-50
inference (/root/reference/vector_embeddings.py:41-59, 86-94, batch_size=1
on one process). Spark-first: ``binaryFile`` scan (splittable listing,
columnar binary payloads) + an Arrow-batched pandas UDF running the model
per executor — the standard pattern for GPU/CPU feature extraction over
100 TB of images.

torch/torchvision are NOT installed in this container (environment
charter): the model-backed path is gated behind an import-try and the
deterministic fallback embedder keeps the whole pipeline (schema, batch
shape, partitioning) real and testable. Swapping in the real model is a
one-function change.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

EMBED_DIM_DEFAULT = 2048  # ResNet-50 penultimate layer (reference dim)


def read_images(spark: SparkSession, image_dir: str, pattern: str = "*.jpg") -> DataFrame:
    """S3 — binary image scan over the 2-hex-char shard layout
    (``00/…4f/*.jpg``, /root/reference/vector_embeddings.py:101-106).
    Emits (path, modificationTime, length, content) per file; pushdown
    prunes by glob before any byte is read."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(image_dir)
        .withColumn("filename", F.substring_index("path", "/", -1))
    )


def _try_torch_embedder(dim: int):
    """Return a torch ResNet-50 batch embedder, or None if torch is absent.

    The real path (/root/reference/vector_embeddings.py:12-35, 65-67):
    seed 42, resize 224×224, ImageNet-normalize (mean .485/.456/.406,
    std .229/.224/.225), pretrained ResNet-50 with the final FC layer
    removed (2048-d penultimate features), eval mode, no grad. Model is
    constructed ONCE per UDF instantiation (→ once per executor python
    worker), not per batch.
    """
    try:  # pragma: no cover - torch not installed in this environment
        import io

        import torch
        from PIL import Image
        from torchvision import models, transforms
    except ImportError:
        return None

    torch.manual_seed(42)  # pragma: no cover
    transform = transforms.Compose(  # pragma: no cover
        [
            transforms.Resize((224, 224)),
            transforms.ToTensor(),
            transforms.Normalize(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
        ]
    )
    model = models.resnet50(weights=models.ResNet50_Weights.DEFAULT)  # pragma: no cover
    model = torch.nn.Sequential(*(list(model.children())[:-1]))  # pragma: no cover
    model.eval()  # pragma: no cover

    def embed(batch: pd.Series) -> pd.Series:  # pragma: no cover
        imgs = [
            transform(Image.open(io.BytesIO(bytes(b))).convert("RGB")) for b in batch
        ]
        with torch.no_grad():
            feats = model(torch.stack(imgs)).squeeze(-1).squeeze(-1)  # (B, 2048)
        out = feats.cpu().numpy().astype("float32")
        if out.shape[1] != dim:  # caller asked for a non-ResNet dim
            raise ValueError(f"resnet50 features are {out.shape[1]}-d, requested {dim}")
        return pd.Series([row.tolist() for row in out])

    return embed


def _fake_embed_bytes(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in embedder: md5-seeded pseudo-random unit
    vector. Stable across processes/partitions (no RNG state), so tests
    and oracle comparisons are reproducible."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(content[:4096] + counter.to_bytes(4, "big")).digest()
        for j in range(0, 16, 4):
            out.append(int.from_bytes(h[j : j + 4], "big") / 2**31 - 1.0)
        counter += 1
    out = out[:dim]
    norm = math.sqrt(sum(x * x for x in out)) or 1.0
    return [x / norm for x in out]


def with_embeddings(
    images: DataFrame, dim: int = EMBED_DIM_DEFAULT, content_col: str = "content"
) -> DataFrame:
    """E1 — embedding extraction as an Arrow-batched pandas UDF.

    Batches cross Python↔JVM via Arrow once per ~10k rows (vs the
    reference's per-image Python→C++ round trip at batch_size=1). The UDF
    is stateless per batch → safe under speculative execution and retries.
    """
    torch_embed = _try_torch_embedder(dim)

    @F.pandas_udf(ArrayType(FloatType()))
    def embed_udf(content: pd.Series) -> pd.Series:
        if torch_embed is not None:  # pragma: no cover
            return torch_embed(content)
        return content.map(lambda b: _fake_embed_bytes(bytes(b or b""), dim))

    return images.withColumn("embedding", embed_udf(F.col(content_col)))
