"""Generate the committed ABO-shaped fixture under fixtures/abo/.

Deterministic (seed 42, stdlib random only). Produces:

- ``fixtures/abo/listings/listings_{0,1}.json`` — JSONL ABO listings with
  the nested attribute shapes of /root/reference metadata (SURVEY.md §1.2,
  FIXTURES.md §1): ``brand``/``color`` array-of-{language_tag,value},
  ``item_weight`` doubly-nested with a pounds ``normalized_value``,
  ``model_year`` array-of-{value} (~3% coverage — the sparse
  attribute-partitioned path), ``country`` bare scalar (IN-skewed).
- ``fixtures/abo/mappings/map{00,01}.csv`` — image_id,width,height,
  ``xx/yyyyyyyy.jpg`` rel-paths (2-hex shard dirs), including orphan
  images, images contested between listings (main-match must beat
  other-match), and shared other-images (lowest item_id wins).
- ``fixtures/abo/items.parquet/`` — OUR OWN ``build_items`` ETL output
  (S1+S2+J1+P1 end-to-end), the nested table the driver's hybrid-query
  oracles read. item_id is dense 0..N−1 in (filename, image_id) order and
  aligns with the driver ``embeddings.vec_id`` domain (N > 2000 ≥ sf0.1's
  max vec_id).

Distribution targets (FIXTURES.md §1): brand ≈100% (~30% contain
'Amazon', case-sensitively), country 100% (IN ≈41%, US ≈23%), color ≈73%
(includes 'Multicolor' vs 'multi-colored' case foils), item_weight ≈70%
(mixed raw units, ~55% under 2 normalized pounds), model_year ≈3%.
Arrays are occasionally length >1 with a DIFFERENT value at index 1 to
pin first-element-only access.

Usage: python tools/make_abo_fixture.py
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import shutil
import sys

sys.path.insert(0, "/root/repo")

ROOT = "/root/repo/fixtures/abo"
N_LISTINGS = 2600
PER_FILE = 1300

BRANDS = [
    ("AmazonBasics", 15),
    ("Amazon Brand - Solimo", 8),
    ("Pinzon by Amazon", 5),
    ("amazonbasics", 3),  # lowercase foil: must NOT match substring 'Amazon'
    ("Rivet", 12),
    ("Stone & Beam", 10),
    ("Solimo", 8),
    ("Umi", 7),
    ("Vedaka", 7),
    ("Symbol", 7),
    ("House & Shields", 6),
    ("Myx", 6),
    ("Arthur Harvey", 6),
]
COLORS = [
    ("Black", 18),
    ("White", 14),
    ("Multicolor", 11),
    ("multi-colored", 6),  # case foil for substring 'Multi'
    ("Blue", 10),
    ("blue", 4),
    ("Red", 9),
    ("Grey", 8),
    ("Green", 7),
    ("Brown", 7),
    ("Silver", 6),
]
COUNTRIES = [
    ("IN", 41),
    ("US", 23),
    ("GB", 7),
    ("DE", 6),
    ("CA", 5),
    ("FR", 4),
    ("IT", 4),
    ("ES", 3),
    ("JP", 3),
    ("AE", 2),
    ("MX", 2),
]
LANG_TAGS = ["en_US", "en_IN", "en_GB", "de_DE", "fr_FR"]
# raw unit → pounds-per-unit (the normalized_value is ALWAYS pounds,
# /root/reference metadata-small.py sample; SURVEY.md §1.2)
UNIT_TO_LBS = {
    "grams": 0.0022046226,
    "kilograms": 2.2046226,
    "ounces": 0.0625,
    "pounds": 1.0,
}


def _pick(rng: random.Random, weighted: list[tuple[str, int]]) -> str:
    vals = [v for v, _ in weighted]
    wts = [w for _, w in weighted]
    return rng.choices(vals, weights=wts, k=1)[0]


def _lang_struct(rng: random.Random, value: str, pool: list[tuple[str, int]]) -> list[dict]:
    out = [{"language_tag": rng.choice(LANG_TAGS), "value": value}]
    if rng.random() < 0.15:  # second element with a DIFFERENT value
        alt = _pick(rng, pool)
        while alt == value:
            alt = _pick(rng, pool)
        out.append({"language_tag": rng.choice(LANG_TAGS), "value": alt})
    return out


def _weight_struct(rng: random.Random) -> list[dict]:
    def one() -> dict:
        unit = rng.choices(
            ["grams", "kilograms", "ounces", "pounds"], weights=[45, 20, 20, 15], k=1
        )[0]
        # ~55% of items end up under 2 normalized pounds
        lbs = round(rng.uniform(0.05, 1.9), 6) if rng.random() < 0.55 else round(
            rng.uniform(2.0, 60.0), 6
        )
        raw = round(lbs / UNIT_TO_LBS[unit], 6)
        return {
            "normalized_value": {"unit": "pounds", "value": lbs},
            "unit": unit,
            "value": raw,
        }

    out = [one()]
    if rng.random() < 0.12:
        out.append(one())
    return out


def gen_listings(rng: random.Random) -> list[dict]:
    listings = []
    for i in range(N_LISTINGS):
        row: dict = {"item_id": f"L{i:06d}", "main_image_id": f"M{i:06d}"}
        others = []
        n_other = rng.choices([0, 1, 2, 3], weights=[40, 30, 20, 10], k=1)[0]
        for j in range(n_other):
            r = rng.random()
            if r < 0.55:
                others.append(f"O{i:06d}_{j}")  # private other-image
            elif r < 0.75:
                others.append(f"S{rng.randrange(120):04d}")  # shared: lowest item_id wins
            else:
                others.append(f"M{rng.randrange(N_LISTINGS):06d}")  # contested: main wins
        if others:
            row["other_image_id"] = others
        row["brand"] = _lang_struct(rng, _pick(rng, BRANDS), BRANDS)
        if rng.random() < 0.73:
            row["color"] = _lang_struct(rng, _pick(rng, COLORS), COLORS)
        if rng.random() < 0.70:
            row["item_weight"] = _weight_struct(rng)
        if rng.random() < 0.03:
            my = [{"value": rng.randrange(2010, 2022)}]
            if rng.random() < 0.2:
                my.append({"value": rng.randrange(2010, 2022)})
            row["model_year"] = my
        row["country"] = _pick(rng, COUNTRIES)
        listings.append(row)
    return listings


def gen_mappings(rng: random.Random, listings: list[dict]) -> list[tuple[str, int, int, str]]:
    # map ~92% of main images, ~70% of private others, all shared S-images,
    # plus orphans that match no listing (must be dropped by J1)
    ids: set[str] = set()
    for row in listings:
        if rng.random() < 0.92:
            ids.add(row["main_image_id"])
        for o in row.get("other_image_id", []):
            if o.startswith("S") or (o.startswith("O") and rng.random() < 0.70):
                ids.add(o)
    for i in range(150):
        ids.add(f"X{i:05d}")  # orphan images
    rows = []
    for img in sorted(ids):
        h = hashlib.md5(img.encode()).hexdigest()[:8]
        rows.append(
            (img, rng.randrange(100, 2000), rng.randrange(100, 2000), f"{h[:2]}/{h}.jpg")
        )
    rng.shuffle(rows)
    return rows


def write_image_fixtures() -> None:
    """Deterministic fake 'images' in the reference's 2-hex-shard layout
    (vector_embeddings.py:101-106) for the S3/E1 driver oracle. Content
    is ASCII-only ON PURPOSE: DuckDB has no md5(BLOB), so the oracle
    hashes CAST(content AS VARCHAR) — identical bytes iff ASCII."""
    import os

    for shard in ("00", "01", "4f"):
        os.makedirs(f"{ROOT}/images/{shard}", exist_ok=True)
    for i in range(12):
        shard = ("00", "01", "4f")[i % 3]
        body = (f"FAKEIMG {i:04d} " + "pixeldata " * (10 + i)).strip()
        with open(f"{ROOT}/images/{shard}/img{i:04d}.jpg", "w") as f:
            f.write(body)


def main() -> None:
    write_image_fixtures()
    rng = random.Random(42)
    listings = gen_listings(rng)
    mappings = gen_mappings(rng, listings)

    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(f"{ROOT}/listings")
    os.makedirs(f"{ROOT}/mappings")
    for fi in range(N_LISTINGS // PER_FILE):
        with open(f"{ROOT}/listings/listings_{fi}.json", "w") as f:
            for row in listings[fi * PER_FILE : (fi + 1) * PER_FILE]:
                f.write(json.dumps(row) + "\n")
    half = len(mappings) // 2
    for fi, chunk in enumerate([mappings[:half], mappings[half:]]):
        with open(f"{ROOT}/mappings/map{fi:02d}.csv", "w") as f:
            for img, w, h, p in chunk:
                f.write(f"{img},{w},{h},{p}\n")

    # run OUR ETL (S1+S2+J1+P1 + dense ids) to materialize the items table
    from acorn_hybrid_vector_search_spark.session import get_spark
    from acorn_hybrid_vector_search_spark.sources.listings import build_items

    spark = get_spark()
    items = build_items(
        spark,
        f"{ROOT}/listings/listings_*.json",
        f"{ROOT}/mappings/map*.csv",
        order_col="item_id",
    )
    items.coalesce(1).write.mode("overwrite").parquet(f"{ROOT}/items.parquet")
    out = spark.read.parquet(f"{ROOT}/items.parquet")
    n = out.count()
    print(f"items rows: {n}")
    print(out.orderBy("item_id").show(5, truncate=False))
    assert n > 2000, "fixture must cover the sf0.1 vec_id domain (0..1999)"

    # K5 build side: the model_year attribute subset (the reference's
    # attribute-specific index, acorn_attribute_specific.py:44-65),
    # materialized with EXACTLY the attribute-presence condition the
    # router's soundness contract requires.
    from acorn_hybrid_vector_search_spark.functions.predicates import abo_accessors
    from acorn_hybrid_vector_search_spark.operators.hybrid import (
        attribute_presence_cond,
        materialize_attribute_subset,
    )

    sub_path = f"{ROOT}/items_model_year.parquet"
    materialize_attribute_subset(
        out.coalesce(1),
        attribute_presence_cond(["model_year"], abo_accessors()),
        sub_path,
    )
    print("model_year subset rows:", spark.read.parquet(sub_path).count())


if __name__ == "__main__":
    main()
