"""Pathological duplicate skew: EVERY document identical, every page on one
host. At 100 TB this is the mirror-site / boilerplate-farm case: LSH bands,
blocking keys and line hashes all collapse into one giant group.

Scale safety here rests on two properties, both asserted below:
- pair enumeration is salted into bounded sub-block tasks by default
  (``salt_rows=2048`` in every linker), so a size-k duplicate cluster costs
  many ~2M-pair tasks, never one k^2/2 monster task;
- the dedupe ENTRY POINTS (exact_dedupe, fuzzy_dedupe) return the collapsed
  survivor table — one row here — so the scalable composition for a
  duplicate-heavy corpus is exact_dedupe FIRST (byte-identical clusters
  collapse to singletons), then near-dup on the survivors.

The pair-set operators (minhash/simhash/ngram) return the TRUE quadratic
pair set — correct semantics, asserted exactly, not a blowup at test size.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray
import ray.data

SF_SRC = "/root/testdata/sf0.001"
SAME_TEXT = (
    "the same exact document text repeated verbatim across the entire "
    "corpus with enough words to shingle"
)


@pytest.fixture(scope="module")
def dupes_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_dupes")
    for f in glob.glob(f"{SF_SRC}/*.parquet"):
        name = os.path.basename(f)
        t = pq.read_table(f)
        if name == "documents.parquet":
            cols = {}
            for fld in t.schema:
                if fld.name == "text":
                    cols[fld.name] = pa.array([SAME_TEXT] * len(t), pa.string())
                elif fld.name == "source":
                    cols[fld.name] = pa.array(["onehost"] * len(t), pa.string())
                else:
                    cols[fld.name] = t[fld.name]
            t = pa.table(cols)
        pq.write_table(t, str(d / name))
    return str(d)


@pytest.fixture(scope="module")
def queries(ray_session):
    import __ray_entry__ as entry_mod

    return entry_mod.queries()


def _rows(r):
    return r.count() if isinstance(r, ray.data.Dataset) else len(r)


def test_exact_dedupe_collapses_to_one(queries, dupes_sf_dir):
    assert _rows(queries["exact_dedupe"](dupes_sf_dir)) == 1


def test_fuzzy_dedupe_collapses_to_one(queries, dupes_sf_dir):
    assert _rows(queries["fuzzy_dedupe"](dupes_sf_dir)) == 1


def test_minhash_emits_true_pair_set_salted(dupes_sf_dir):
    """500 identical docs -> exactly C(500,2) verified pairs, produced by
    salted bounded sub-block tasks, with every pair jaccard-verified."""
    from mismo_ray.dedupe import minhash_lsh_pairs

    docs = ray.data.read_parquet(
        f"{dupes_sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: t.rename_columns(["record_id", "text"]), batch_format="pyarrow"
    )
    linkage = minhash_lsh_pairs(docs, "text", verify_jaccard=0.8)
    assert linkage.links_ds.count() == 500 * 499 // 2


@pytest.mark.parametrize(
    "name", ["dedupe_report", "drop_dup_lines", "host_stats", "flagship_er",
             "connected_components", "sorted_neighborhood", "incremental_dedupe"]
)
def test_query_bounded_on_duplicate_skew(queries, dupes_sf_dir, name):
    assert _rows(queries[name](dupes_sf_dir)) >= 0  # terminates, bounded tasks


@pytest.fixture(scope="module")
def const_emb_sf_dir(tmp_path_factory):
    """Every embedding identical: k-means degeneracy (ties everywhere,
    potentially empty clusters) and an all-pairs neardup bucket."""
    d = tmp_path_factory.mktemp("sf_constemb")
    for f in glob.glob(f"{SF_SRC}/*.parquet"):
        name = os.path.basename(f)
        t = pq.read_table(f)
        if name == "embeddings.parquet":
            dim = len(t["embedding"][0])
            const = [[1.0] + [0.0] * (dim - 1)] * len(t)
            cols = {
                fld.name: (
                    pa.array(const, type=fld.type)
                    if fld.name == "embedding"
                    else t[fld.name]
                )
                for fld in t.schema
            }
            t = pa.table(cols)
        pq.write_table(t, str(d / name))
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "ann_topk",
        "ivf_topk",
        "ivfpq_topk",
        "embedding_neardup",
        "semdedup",
        "embedding_linker_link",
        "mmr_select",  # all-tie greedy chains must fall to the min-id rule
        "kcenter_select",
    ],
)
def test_ann_family_on_constant_embeddings(queries, const_emb_sf_dir, name):
    """k-means over identical points, tie-ranked neighbors: bounded,
    deterministic, no crash."""
    assert _rows(queries[name](const_emb_sf_dir)) >= 0


def test_diverse_selectors_all_ties_pick_min_ids(queries, const_emb_sf_dir):
    """500 identical embeddings: every greedy score ties at every step, so
    both selectors must walk the pool in ascending id order exactly."""
    import pyarrow as pa

    for name in ("mmr_select", "kcenter_select"):
        out = queries[name](const_emb_sf_dir)
        t = out.to_pandas() if hasattr(out, "to_pandas") else pa.table(out).to_pandas()
        ids = t.sort_values("rank")["vec_id"].tolist()
        assert ids == sorted(ids), name
        assert len(ids) == len(set(ids)) == 8, name


def test_constant_embeddings_neardup_is_complete(queries, const_emb_sf_dir):
    """500 identical embeddings -> the full C(500,2) near-dup pair set."""
    assert _rows(queries["embedding_neardup"](const_emb_sf_dir)) == 500 * 499 // 2


def test_dedupe_report_single_cluster(queries, dupes_sf_dir):
    """One 500-member cluster: the report shows the full savings."""
    r = queries["dedupe_report"](dupes_sf_dir)
    t = (
        pa.concat_tables(list(r.iter_batches(batch_format="pyarrow", batch_size=None)))
        if isinstance(r, ray.data.Dataset)
        else (r if isinstance(r, pa.Table) else pa.Table.from_pandas(r))
    )
    assert len(t) == 1
