"""EXT operator tests: dedup/similarity/text/multimodal semantics that the
oracle harness can't fully check (approx ops, agreement between exact and
fast paths, stub behavior)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark.functions import multimodal as MM
from dbt_snowflake_feature_store_spark.functions import similarity as SIM
from dbt_snowflake_feature_store_spark.functions import text as TXT


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "The quick brown fox  jumps over the lazy dog!"),  # near-exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDedup:
    def test_exact_dedup_normalizes(self, spark, docs_with_dups):
        out = TXT.dedup_exact(docs_with_dups).collect()
        # 1, 2, 5 collapse (normalization strips case/punct/extra ws)
        by_id = {r["doc_id"]: r["n_copies"] for r in out}
        assert by_id[1] == 3
        assert by_id[3] == 1
        assert by_id[4] == 1
        assert len(out) == 3

    def test_minhash_finds_near_dups(self, spark, docs_with_dups):
        pairs = TXT.dedup_near_minhash(
            docs_with_dups, jaccard_threshold=0.3, shingle_k=2
        ).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 5) in found  # exact dup always caught
        assert (1, 2) in found  # normalization-level dup
        assert not any(4 in p for p in found)  # unrelated doc never pairs

    def test_minhash_deterministic(self, spark, docs_with_dups):
        a = sorted(map(tuple, TXT.dedup_near_minhash(docs_with_dups, jaccard_threshold=0.3).collect()))
        b = sorted(map(tuple, TXT.dedup_near_minhash(docs_with_dups, jaccard_threshold=0.3).collect()))
        assert a == b

    def test_chunk_dedup_exact_keys_flag(self, spark, sf_dir):
        """The documented exact-string fallback (r5 ADVICE): joining on
        the chunk strings must produce the identical accounting as the
        8-byte-hash scale path on the real corpus."""
        from dbt_snowflake_feature_store_spark.operators.ext_text import (
            q_dedup_chunks,
            q_dedup_cross_source,
        )

        for q in (q_dedup_chunks, q_dedup_cross_source):
            hashed = sorted(map(tuple, q(spark, sf_dir).collect()))
            exact = sorted(
                map(tuple, q(spark, sf_dir, exact_keys=True).collect())
            )
            assert hashed == exact

    def test_minhash_recall_vs_exact_ngram(self, spark, sf_dir):
        """MinHash-LSH candidates must recover the exact word-3-gram
        Jaccard pairs (q_dedup_ngram is the exact counterpart) on real
        documents. Guards the numpy hash family against recall
        regressions."""
        from dbt_snowflake_feature_store_spark.operators.ext_text import (
            q_dedup_near,
            q_dedup_ngram,
        )

        exact = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in q_dedup_ngram(spark, sf_dir).collect()
            if r["f_jaccard"] >= 0.7
        }
        approx = {
            (r["id_a"], r["id_b"]) for r in q_dedup_near(spark, sf_dir).collect()
        }
        assert exact, "fixture data must contain exact near-dup pairs"
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, f"minhash recall {recall:.2f} < 0.8 ({exact - approx})"

    def test_simhash_close_for_near_dups(self, spark, docs_with_dups):
        rows = docs_with_dups.select(
            "doc_id", TXT.simhash64(F.col("text")).alias("h")
        ).collect()
        h = {r["doc_id"]: r["h"] for r in rows}
        assert h[1] == h[5]  # identical text → identical simhash
        ham_12 = bin((h[1] ^ h[3]) & ((1 << 64) - 1)).count("1")
        ham_14 = bin((h[1] ^ h[4]) & ((1 << 64) - 1)).count("1")
        assert ham_12 < ham_14  # near-dup closer than unrelated


class TestSimilarity:
    def test_fast_path_agrees_with_exact(self, spark, sf_dir):
        from dbt_snowflake_feature_store_spark.operators.ext_similarity import (
            q_sim_topk,
            q_sim_topk_fast,
        )

        exact_ids = [r["vec_id"] for r in q_sim_topk(spark, sf_dir).collect()]
        fast_ids = [r["vec_id"] for r in q_sim_topk_fast(spark, sf_dir).collect()]
        assert exact_ids == fast_ids

    def test_ann_results_subset_scored_correctly(self, spark, sf_dir):
        from dbt_snowflake_feature_store_spark.operators.ext_similarity import (
            q_sim_ann_lsh,
        )

        rows = q_sim_ann_lsh(spark, sf_dir).collect()
        assert 0 < len(rows) <= 10
        scores = [r["cosine"] for r in rows]
        assert scores == sorted(scores, reverse=True)

    def test_ivf_recall_and_determinism(self, spark, sf_dir):
        from dbt_snowflake_feature_store_spark.operators.ext_similarity import (
            q_sim_ivf,
            q_sim_topk,
        )

        ivf1 = [r["vec_id"] for r in q_sim_ivf(spark, sf_dir).collect()]
        ivf2 = [r["vec_id"] for r in q_sim_ivf(spark, sf_dir).collect()]
        assert ivf1 == ivf2  # deterministic (fixed k-means seed)
        exact = [r["vec_id"] for r in q_sim_topk(spark, sf_dir).collect()]
        # ANN recall: probing 3/8 cells should still find most true top-k
        assert len(set(ivf1) & set(exact)) >= 5

    def test_embed_quantize_properties(self, spark, sf_dir):
        """Every vector saturates at least one element (the max |x|
        quantizes to exactly ±127), scale is positive, and the sum of
        quantized values is bounded by 127·dim."""
        from dbt_snowflake_feature_store_spark.operators.ext_similarity import (
            q_embed_quantize,
        )
        from dbt_snowflake_feature_store_spark.sources import read_table

        dim = len(
            read_table(spark, sf_dir, "embeddings").head()["embedding"]
        )
        rows = q_embed_quantize(spark, sf_dir).collect()
        assert len(rows) > 0
        for r in rows:
            assert r["f_scale"] > 0
            assert r["f_n_sat"] >= 1
            assert abs(r["f_sum_q"]) <= 127 * dim

    def test_ivf_drift_detection_and_refresh_restores_recall(
        self, spark, sf_dir, tmp_path
    ):
        """VERDICT r7 item 6 — the FAISS re-train discipline: a corpus
        that walks away from the trained centroids (a) trips the drift
        probe (mean residual >> build-time baseline), (b) degrades probe
        recall through the STALE quantizer, and (c) recovers recall
        after refresh_ann_index re-trains from a fresh bounded sample.
        Drift shape: each vector gains a unit offset on axis label%8 —
        exact neighbors become cluster-mates (shared offset) while the
        stale assignment still splits clusters by the surviving original
        components, so true neighbors scatter across unprobed cells."""
        from dbt_snowflake_feature_store_spark import FeatureStore
        from dbt_snowflake_feature_store_spark.sources import read_table

        e = read_table(spark, sf_dir, "embeddings")
        fs = FeatureStore(spark, str(tmp_path / "root"), name="ANN_FS")
        fs.build_ann_index("emb_idx", e, num_centroids=16)

        # fresh corpus: drift probe declines to rebuild
        assert fs.refresh_ann_index("emb_idx", e) == "SKIPPED"

        drifted = e.select(
            "vec_id",
            "label",
            F.expr(
                "transform(embedding, (x, i) -> cast(x as double) + "
                "CASE WHEN i = cast(label % 8 AS INT) THEN 1.0 "
                "ELSE 0.0 END)"
            ).alias("embedding"),
        ).cache()

        import os

        idx_path = os.path.join(
            fs._ann_current_dir("emb_idx"), "index.json"
        )
        stale_idx = SIM.IVFIndex.load(idx_path)
        assert stale_idx.train_residual is not None
        assert not stale_idx.needs_refresh(e)
        assert stale_idx.needs_refresh(drifted)
        # measured ratio ~2.1× on the fixed corpus (unit offset)
        assert stale_idx.mean_residual(drifted) > 1.5 * stale_idx.train_residual

        # recall through the stale quantizer vs exact, over 5 queries
        queries = drifted.orderBy("vec_id").limit(5).collect()

        def _recall(index) -> float:
            tot = 0.0
            for qrow in queries:
                q = [float(v) for v in qrow["embedding"]]
                exact = {
                    r["vec_id"]
                    for r in SIM.cosine_topk(drifted, q, 10).collect()
                }
                got = {
                    r["vec_id"]
                    for r in index.search(
                        drifted, q, k=10, n_probe=2
                    ).collect()
                }
                tot += len(exact & got) / 10.0
            return tot / len(queries)

        stale_recall = _recall(stale_idx)
        assert stale_recall <= 0.7  # measured 0.54 on the fixed corpus

        # store-level refresh: detects drift, re-trains (bounded sample
        # collect only), re-materializes, bumps the registry counter
        assert fs.refresh_ann_index("emb_idx", drifted) == "REFRESHED"
        assert (
            fs.registry.get("ann_indexes", "EMB_IDX")["refresh_count"] == 1
        )
        fresh_idx = SIM.IVFIndex.load(
            os.path.join(fs._ann_current_dir("emb_idx"), "index.json")
        )
        assert not fresh_idx.needs_refresh(drifted)
        fresh_recall = _recall(fresh_idx)
        assert fresh_recall >= 0.85  # measured 0.90
        assert fresh_recall > stale_recall

        # the re-materialized layout serves the drifted corpus
        q0 = [float(v) for v in queries[0]["embedding"]]
        served = fs.ann_search("emb_idx", q0, k=10, n_probe=2)
        exact0 = {
            r["vec_id"] for r in SIM.cosine_topk(drifted, q0, 10).collect()
        }
        got0 = {r["vec_id"] for r in served.collect()}
        assert len(exact0 & got0) / 10.0 >= 0.8
        drifted.unpersist()

    def test_ann_refresh_crash_leaves_matched_pair(
        self, spark, sf_dir, tmp_path, monkeypatch
    ):
        """Code-review r8 finding: a failure mid-refresh must leave the
        OLD matched (centroids, layout) pair live — never new centroids
        over an old layout. The commit is the atomic CURRENT flip,
        which happens only after the new version dir is complete."""
        import os

        from dbt_snowflake_feature_store_spark import FeatureStore
        from dbt_snowflake_feature_store_spark.sources import read_table

        e = read_table(spark, sf_dir, "embeddings")
        fs = FeatureStore(spark, str(tmp_path / "root"), name="ANN_CR")
        fs.build_ann_index("cr_idx", e, num_centroids=8)
        vdir_before = fs._ann_current_dir("cr_idx")
        idx_before = SIM.IVFIndex.load(
            os.path.join(vdir_before, "index.json")
        )

        # make the re-materialization blow up mid-refresh
        def boom(self, df, path, emb_col="embedding", cell_col="_cell"):
            raise RuntimeError("simulated executor loss")

        monkeypatch.setattr(SIM.IVFIndex, "materialize", boom)
        with pytest.raises(RuntimeError, match="simulated"):
            fs.refresh_ann_index("cr_idx", e, force=True)
        monkeypatch.undo()

        # CURRENT still points at the old, complete version
        assert fs._ann_current_dir("cr_idx") == vdir_before
        idx_after = SIM.IVFIndex.load(
            os.path.join(vdir_before, "index.json")
        )
        assert idx_after.centroids == idx_before.centroids
        # and the layout it references still serves searches
        q = [float(x) for x in e.head()["embedding"]]
        assert fs.ann_search("cr_idx", q, k=5, n_probe=2).count() == 5

    def test_ivf_v1_index_file_backcompat(self, spark, sf_dir, tmp_path):
        """Pre-drift (v1) index files still load and search; only the
        drift check demands a rebuild, loudly."""
        import json

        from dbt_snowflake_feature_store_spark.sources import read_table

        e = read_table(spark, sf_dir, "embeddings")
        idx = SIM.IVFIndex.build(e, num_centroids=8, seed=42)
        p = str(tmp_path / "v1.json")
        with open(p, "w") as f:
            json.dump(
                {"format": "ivf-centroids-v1", "centroids": idx.centroids}, f
            )
        v1 = SIM.IVFIndex.load(p)
        assert v1.centroids == idx.centroids
        assert v1.train_residual is None
        with pytest.raises(ValueError, match="train_residual"):
            v1.needs_refresh(e)

    def test_ivf_index_persists_to_disk(self, spark, sf_dir, tmp_path):
        """FAISS-style index-state lifecycle: build once, save, load in
        a 'later session', identical assignments and search results."""
        from dbt_snowflake_feature_store_spark.sources import read_table

        e = read_table(spark, sf_dir, "embeddings")
        idx = SIM.IVFIndex.build(e, num_centroids=8, seed=42)
        p = str(tmp_path / "ivf_index.json")
        idx.save(p)
        loaded = SIM.IVFIndex.load(p)
        assert loaded.centroids == idx.centroids
        assert loaded.train_residual == idx.train_residual  # drift baseline
        q = [0.1] * len(idx.centroids[0])
        assert loaded.probe_cells(q, 3) == idx.probe_cells(q, 3)

    def test_cosine_self_similarity_is_one(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0]), (2, [2.0, 4.0, 6.0]), (3, [-1.0, 0.0, 1.0])],
            "vec_id long, embedding array<float>",
        )
        out = SIM.cosine_topk(df, [1.0, 2.0, 3.0], k=3)
        rows = out.collect()
        assert rows[0]["vec_id"] in (1, 2)  # colinear vectors tie at 1.0
        assert abs(rows[0]["cosine"] - 1.0) < 1e-9
        assert rows[2]["vec_id"] == 3

    def test_embed_dedup_pairs(self, spark):
        df = spark.createDataFrame(
            [
                (1, [1.0] * 64),
                (2, [1.0] * 64),  # identical
                (3, [float(i) for i in range(64)]),
            ],
            "vec_id long, embedding array<float>",
        )
        pairs = SIM.cosine_pairs_lsh(df, threshold=0.999, num_bits=4).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


class TestTextFunctions:
    def test_lang_id_obvious_cases(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat is in the house and it was good"),
                (2, "der Hund ist nicht auf das Auto und die Katze"),
                (3, "le chat est dans la maison et les chiens pour que"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["pred_lang"] for r in TXT.lang_id(df).collect()}
        assert out == {1: "en", 2: "de", 3: "fr"}

    def test_winnowing_overlap_for_near_dups(self, spark, docs_with_dups):
        rows = (
            TXT.with_winnowing_fingerprint(docs_with_dups, "text", out_col="fp")
            .select("doc_id", "fp")
            .collect()
        )
        fp = {r["doc_id"]: set(r["fp"]) for r in rows}
        assert fp[1] == fp[5]
        overlap_near = len(fp[1] & fp[3])
        overlap_far = len(fp[1] & fp[4])
        assert overlap_near > overlap_far

    def test_quality_score_bounds(self, spark, tables, sf_dir):
        out = TXT.quality_score(tables["documents"]).select("q_score").collect()
        assert all(0.0 <= r["q_score"] <= 1.0 for r in out)


class TestMultimodal:
    def test_strict_mode_raises(self, spark, tables):
        media = MM.documents_as_media(tables["documents"].limit(5))
        out = MM.decode_and_featurize(media, deterministic_fake=False)
        with pytest.raises(Exception, match="NotImplementedError|codec"):
            out.collect()

    def test_fake_decode_plumbing(self, spark, tables):
        media = MM.documents_as_media(tables["documents"].limit(20))
        out = MM.decode_and_featurize(media, deterministic_fake=True).collect()
        assert len(out) == 20
        assert all(r["decode_ok"] for r in out)
        assert all(len(r["feat"]) == 8 for r in out)
        assert all(r["modality"] == "image" for r in out)
        # deterministic: same content → same feature
        again = MM.decode_and_featurize(media, deterministic_fake=True).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    def test_content_stats_no_decode(self, spark, tables):
        media = MM.documents_as_media(tables["documents"].limit(5))
        stats = MM.with_content_stats(media).collect()
        assert all(r["content_bytes"] > 0 for r in stats)
        assert all(len(r["content_sha256"]) == 64 for r in stats)

    def test_resize_shapes_and_strict(self, spark, tables):
        media = MM.documents_as_media(tables["documents"].limit(10))
        out = MM.resize_media(media, 8, 4, deterministic_fake=True).collect()
        assert len(out) == 10
        assert all(len(r["content"]) == 32 for r in out)
        assert all(r["width"] == 8 and r["height"] == 4 for r in out)
        with pytest.raises(Exception, match="NotImplementedError|codec|PIL"):
            MM.resize_media(media, 8, 4, deterministic_fake=False).collect()

    def test_frame_sampling_fanout(self, spark, tables):
        """One media row fans out to duration//step frame rows; counts
        follow the typed metadata exactly."""
        media = MM.documents_as_media(tables["documents"].limit(10))
        frames = MM.sample_frames(media, every_ms=100, deterministic_fake=True)
        counts = {
            r["media_id"]: r["n"]
            for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
        }
        expected = {
            r["media_id"]: max(r["meta"]["duration_ms"] // 100, 1)
            for r in media.collect()
        }
        assert counts == expected
        one = frames.filter("media_id = 0").orderBy("frame_idx").collect()
        if one:
            assert [r["frame_ts_ms"] for r in one] == [
                i * 100 for i in range(len(one))
            ]
        with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
            MM.sample_frames(media, deterministic_fake=False).collect()


class TestCorpusAccounting:
    """Invariant tests for the corpus-accounting keys (q_dedup_chunks,
    q_vocab_build, q_domain_mix, q_filter_funnel) — value-level
    correctness is oracle-gated; these pin the structural properties a
    pipeline consumer relies on."""

    def test_chunk_dedup_bounds_and_exact_dups(self, spark, sf_dir):
        from dbt_snowflake_feature_store_spark.operators.ext_text import (
            q_dedup_chunks,
        )

        out = q_dedup_chunks(spark, sf_dir)
        rows = out.collect()
        assert rows
        for r in rows:
            assert 0 <= r["f_dup_chunks"] <= r["f_n_chunks"]
            assert 0.0 <= r["f_dup_ratio"] <= 1.0
        # every member of an exact-duplicate group has ALL chunks
        # duplicated (the whole normalized text repeats verbatim)
        from dbt_snowflake_feature_store_spark.functions.text import dedup_exact
        from dbt_snowflake_feature_store_spark.sources import read_table

        docs = read_table(spark, sf_dir, "documents")
        groups = dedup_exact(docs, "text", "doc_id").filter("n_copies > 1")
        dup_reps = [r["doc_id"] for r in groups.collect()]
        if dup_reps:
            by_id = {r["doc_id"]: r for r in rows}
            for rep in dup_reps:
                assert by_id[rep]["f_dup_ratio"] == 1.0, rep

    def test_vocab_ranks_and_coverage_monotone(self, spark, sf_dir):
        from dbt_snowflake_feature_store_spark.operators.ext_text import (
            q_vocab_build,
        )

        rows = q_vocab_build(spark, sf_dir).orderBy("f_rank").collect()
        assert rows
        assert [r["f_rank"] for r in rows] == list(range(1, len(rows) + 1))
        counts = [r["f_count"] for r in rows]
        assert counts == sorted(counts, reverse=True)
        cums = [r["f_cum_ppm"] for r in rows]
        assert cums == sorted(cums)
        assert cums[-1] <= 1000001

    def test_domain_mix_shares_sum_to_one(self, spark, sf_dir):
        from dbt_snowflake_feature_store_spark.operators.ext_text import (
            q_domain_mix,
        )

        rows = q_domain_mix(spark, sf_dir).collect()
        assert rows
        total_ppm = sum(r["f_token_ppm"] for r in rows)
        # half-up rounding drift: at most 0.5 ppm per source
        assert abs(total_ppm - 1000000) <= len(rows)

    def test_filter_funnel_is_monotone(self, spark, sf_dir):
        from dbt_snowflake_feature_store_spark.operators.ext_text import (
            q_filter_funnel,
        )

        rows = q_filter_funnel(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert (
                r["f_total"]
                >= r["f_pass_len"]
                >= r["f_pass_words"]
                >= r["f_pass_shape"]
                >= r["f_pass_all"]
            ), r

    def test_embed_outliers_flags_planted_vector(self, spark, sf_dir):
        from dbt_snowflake_feature_store_spark.operators import ext_similarity as ES

        rows = [(i, [0.1, 0.1, 0.1, 0.1] + [0.0] * 60, 1) for i in range(20)]
        rows.append((99, [0.9, -0.9, 0.9, -0.9] + [0.0] * 60, 1))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

        orig_emb = ES._emb
        try:
            ES._emb = lambda s, d: df
            res = {r["vec_id"]: r for r in ES.q_embed_outliers(spark, sf_dir).collect()}
        finally:
            ES._emb = orig_emb
        assert res[99]["f_outlier"] is True
        assert all(not res[i]["f_outlier"] for i in range(20))
        # identical vectors inside the cluster -> identical dist2
        assert len({res[i]["f_dist2"] for i in range(20)}) == 1

    def test_sample_to_mix_hits_targets(self, spark, sf_dir):
        """The kept per-language counts must reproduce the temperature
        targets: kept_lang/total_kept within hash-granularity tolerance
        of target_ppm/1e6, and the most-constrained language kept whole
        (threshold == 1e6 for at least one language)."""
        from dbt_snowflake_feature_store_spark.operators.ext_text import (
            q_sample_to_mix,
        )

        rows = q_sample_to_mix(spark, sf_dir).collect()
        assert rows
        total_kept = sum(r["f_kept"] for r in rows)
        assert total_kept > 0
        assert any(r["f_threshold"] >= 999999 for r in rows)
        for r in rows:
            assert 0 <= r["f_kept"] <= r["f_docs"]
            got_share = r["f_kept"] / total_kept
            want_share = r["f_target_ppm"] / 1e6
            # small strata + hash granularity: generous but bounded
            assert abs(got_share - want_share) < 0.08, (r, got_share)

    def test_pack_bfd_capacity_and_beats_greedy(self, spark, sf_dir):
        """BFD bins respect capacity (single-doc overflow excepted),
        packing is deterministic, every doc lands exactly once, and BFD
        wastes no more padding than the doc-id-order greedy cumsum."""
        from dbt_snowflake_feature_store_spark.operators.ext_text import (
            q_pack_bfd,
            q_pack_sequences,
        )
        from dbt_snowflake_feature_store_spark.functions.text import (
            pack_sequences_bfd,
        )
        from dbt_snowflake_feature_store_spark.sources import read_table

        docs = read_table(spark, sf_dir, "documents")
        packed = pack_sequences_bfd(docs)
        rows = packed.collect()
        assert len(rows) == docs.count()  # every doc exactly once
        per_bin = {}
        for r in rows:
            key = (r["lang"], r["f_pack"])
            per_bin.setdefault(key, []).append(r["n_toks"])
        for key, toks in per_bin.items():
            if len(toks) > 1:
                assert sum(toks) <= 2048, key

        again = sorted(map(tuple, pack_sequences_bfd(docs).collect()))
        assert again == sorted(map(tuple, rows))  # deterministic

        # Baseline: no-split NEXT-FIT in doc_id order per (lang, shard)
        # (q_pack_sequences is stream CHUNKING — docs straddle bin
        # boundaries — so its bin count is a lower bound, not a
        # comparable no-split packer). BFD must never need more bins.
        by_shard = {}
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            by_shard.setdefault((r["lang"], r["f_shard"]), []).append(
                r["n_toks"]
            )
        nf_bins = {}
        for (lang, _), toks in by_shard.items():
            bins, room = 0, 0
            for n in toks:
                if bins == 0 or n > room:
                    bins += 1
                    room = max(2048 - n, 0)
                else:
                    room -= n
            nf_bins[lang] = nf_bins.get(lang, 0) + bins
        bfd = {r["lang"]: r for r in q_pack_bfd(spark, sf_dir).collect()}
        total_toks = {}
        for r in rows:
            total_toks[r["lang"]] = total_toks.get(r["lang"], 0) + r["n_toks"]
        for lang, b in bfd.items():
            assert b["f_tokens"] == total_toks[lang]  # same token mass
            assert b["f_packs"] <= nf_bins[lang], lang  # never worse than NF

    def test_corpus_dedup_api_consistent_with_stats_key(self, spark, sf_dir):
        """The public keep-set API must agree with the accounting the
        oracle-gated q_corpus_dedup_stats reports (same per-language
        kept counts) and preserve the input schema."""
        from dbt_snowflake_feature_store_spark.functions.text import (
            corpus_dedup,
        )
        from dbt_snowflake_feature_store_spark.operators.ext_text import (
            q_corpus_dedup_stats,
        )
        from dbt_snowflake_feature_store_spark.sources import read_table

        docs = read_table(spark, sf_dir, "documents")
        kept = corpus_dedup(
            docs, method="portable", shingle_k=3, num_hashes=32, bands=8
        )
        assert kept.columns == docs.columns  # original schema preserved
        per_lang = {
            r["lang"]: r["n"]
            for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        stats = {
            r["lang"]: r["f_docs_kept"]
            for r in q_corpus_dedup_stats(spark, sf_dir).collect()
        }
        assert per_lang == stats
        with pytest.raises(ValueError, match="unknown method"):
            corpus_dedup(docs, method="bogus")


class TestPairCacheEviction:
    def test_dead_application_entries_evicted(self, spark, sf_dir):
        """_portable_pairs evicts cache entries whose applicationId no
        longer matches the live session (ADVICE r6): dead-app frames
        never accumulate and never get served."""
        from dbt_snowflake_feature_store_spark.operators import ext_text

        live_key = (spark.sparkContext.applicationId, sf_dir)
        ext_text._PAIR_CACHE[("dead-app-123", sf_dir)] = "stale-frame"
        ext_text._PAIR_CACHE[("dead-app-123", "/other/dir")] = "stale-frame2"
        df = ext_text._portable_pairs(spark, sf_dir)
        assert df.count() > 0
        assert all(k[0] == live_key[0] for k in ext_text._PAIR_CACHE)
        assert ("dead-app-123", sf_dir) not in ext_text._PAIR_CACHE
        # the live entry is memoized: same object served back
        assert ext_text._portable_pairs(spark, sf_dir) is not None
        assert live_key in ext_text._PAIR_CACHE


class TestPQ:
    def test_pq_compression_determinism_roundtrip(self, spark, sf_dir, tmp_path):
        from dbt_snowflake_feature_store_spark.functions.similarity import (
            PQIndex,
        )
        from dbt_snowflake_feature_store_spark.sources import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        idx = PQIndex.build(emb, m=8, k=16)
        assert (idx.m, idx.k, idx.dsub) == (8, 16, 8)
        enc = idx.encode(emb).select("vec_id", "_pq")
        rows = enc.collect()
        # 64 floats -> 8 small codes, all within [0, k)
        assert all(len(r["_pq"]) == 8 for r in rows)
        assert all(0 <= c < 16 for r in rows for c in r["_pq"])
        # deterministic: same sample order, same seed -> same codebooks
        idx2 = PQIndex.build(emb, m=8, k=16)
        assert idx2.codebooks == idx.codebooks
        # index file round-trip (incl. the r8 drift baseline)
        p = str(tmp_path / "pq.json")
        idx.save(p)
        loaded = PQIndex.load(p)
        assert loaded.codebooks == idx.codebooks
        assert loaded.train_mse == idx.train_mse
        assert idx.train_mse is not None and idx.train_mse > 0

    def test_pq_drift_detection(self, spark, sf_dir, tmp_path):
        """Same re-train discipline as IVF (r8): the corpus walking away
        from the trained codebooks trips the reconstruction-error probe;
        re-training on the drifted corpus clears it. v1 index files load
        but demand a rebuild for drift checks."""
        import json

        from dbt_snowflake_feature_store_spark.functions.similarity import (
            PQIndex,
        )
        from dbt_snowflake_feature_store_spark.sources import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        idx = PQIndex.build(emb, m=8, k=16)
        assert not idx.needs_refresh(emb)
        # probe ≈ baseline on the training corpus itself
        cur = idx.mean_reconstruction_error(emb)
        assert cur <= 1.2 * idx.train_mse

        drifted = emb.select(
            "vec_id",
            "label",
            F.expr(
                "transform(embedding, (x, i) -> cast(x as double) + "
                "CASE WHEN i = cast(label % 8 AS INT) THEN 1.0 "
                "ELSE 0.0 END)"
            ).alias("embedding"),
        )
        assert idx.needs_refresh(drifted)
        fresh = PQIndex.build(drifted, m=8, k=16)
        assert not fresh.needs_refresh(drifted)

        # v1 file: loads, searches, but drift check raises loudly
        p = str(tmp_path / "pq_v1.json")
        with open(p, "w") as f:
            json.dump(
                {"format": "pq-codebooks-v1", "codebooks": idx.codebooks}, f
            )
        v1 = PQIndex.load(p)
        assert v1.train_mse is None
        with pytest.raises(ValueError, match="train_mse"):
            v1.needs_refresh(emb)

    def test_pq_adc_recall_and_self_match(self, spark, sf_dir):
        from dbt_snowflake_feature_store_spark.functions.similarity import (
            PQIndex,
            cosine_topk,
        )
        from dbt_snowflake_feature_store_spark.sources import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        idx = PQIndex.build(emb, m=8, k=16)
        enc = idx.encode(emb).select("vec_id", "_pq").localCheckpoint()
        q = [
            float(x)
            for x in emb.filter("vec_id = 0").head()["embedding"]
        ]
        exact = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
        got10 = [r["vec_id"] for r in idx.search(enc, q, k=10).collect()]
        got50 = [r["vec_id"] for r in idx.search(enc, q, k=50).collect()]
        # the query vector itself quantizes to itself -> rank 1
        assert got10[0] == 0
        # 32x compression on near-orthogonal synthetic vectors: measured
        # 0.4 raw / 0.8 candidate recall — floors pinned below that
        assert len(set(got10) & set(exact)) / 10 >= 0.2
        assert len(set(got50) & set(exact)) / 10 >= 0.6

    def test_pq_rejects_indivisible_dim(self, spark, sf_dir):
        from dbt_snowflake_feature_store_spark.functions.similarity import (
            PQIndex,
        )
        from dbt_snowflake_feature_store_spark.sources import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="not divisible"):
            PQIndex.build(emb, m=7)


class TestAnnStorePQ:
    """VERDICT r8 item 4 — the store-level PQ / IVFPQ ANN surface:
    build, drift-probe, refresh, and search through FeatureStore, the
    pytest mirror of the IVF drift test (fresh SKIPPED, drifted
    REFRESHED via mean_reconstruction_error, refresh restores
    candidate quality), plus the version-retention discipline."""

    def _drifted(self, e):
        return e.select(
            "vec_id",
            "label",
            F.expr(
                "transform(embedding, (x, i) -> cast(x as double) + "
                "CASE WHEN i = cast(label % 8 AS INT) THEN 1.0 "
                "ELSE 0.0 END)"
            ).alias("embedding"),
        )

    def test_pq_store_drift_cycle(self, spark, sf_dir, tmp_path):
        import os

        from dbt_snowflake_feature_store_spark import FeatureStore
        from dbt_snowflake_feature_store_spark.sources import read_table

        e = read_table(spark, sf_dir, "embeddings")
        fs = FeatureStore(spark, str(tmp_path / "root"), name="PQ_FS")
        fs.build_ann_index("pq_idx", e, index_type="pq", pq_m=8, pq_k=16)
        doc = fs.registry.get("ann_indexes", "PQ_IDX")
        assert doc["index_type"] == "pq"

        # fresh corpus: reconstruction-error probe declines to rebuild
        assert fs.refresh_ann_index("pq_idx", e) == "SKIPPED"

        # searches run off the codes-only table (no embedding column)
        data = os.path.join(fs._ann_current_dir("pq_idx"), "data")
        assert "embedding" not in spark.read.parquet(data).columns
        q = [float(x) for x in e.head()["embedding"]]
        got = fs.ann_search("pq_idx", q, k=10).collect()
        assert len(got) == 10
        dists = [r["adc_dist"] for r in got]
        assert dists == sorted(dists)

        # drifted corpus trips the probe and refresh re-trains
        drifted = self._drifted(e).cache()
        stale = SIM.PQIndex.load(
            os.path.join(fs._ann_current_dir("pq_idx"), "index.json")
        )
        assert stale.train_mse is not None
        assert not stale.needs_refresh(e)
        assert stale.needs_refresh(drifted)
        assert fs.refresh_ann_index("pq_idx", drifted) == "REFRESHED"
        assert fs.registry.get("ann_indexes", "PQ_IDX")["refresh_count"] == 1
        fresh = SIM.PQIndex.load(
            os.path.join(fs._ann_current_dir("pq_idx"), "index.json")
        )
        assert not fresh.needs_refresh(drifted)
        # the refreshed codebooks reconstruct the drifted corpus
        # strictly better than the stale ones
        assert fresh.mean_reconstruction_error(
            drifted
        ) < stale.mean_reconstruction_error(drifted)
        drifted.unpersist()

    def test_ivfpq_store_cell_pruned_adc(self, spark, sf_dir, tmp_path):
        import os

        from dbt_snowflake_feature_store_spark import FeatureStore
        from dbt_snowflake_feature_store_spark.sources import read_table

        e = read_table(spark, sf_dir, "embeddings")
        fs = FeatureStore(spark, str(tmp_path / "root"), name="IVFPQ_FS")
        fs.build_ann_index(
            "ip_idx", e, index_type="ivfpq", num_centroids=8, pq_m=8
        )
        vdir = fs._ann_current_dir("ip_idx")
        assert os.path.isfile(os.path.join(vdir, "ivf.json"))
        assert os.path.isfile(os.path.join(vdir, "pq.json"))
        # layout: codes partitioned by cell, raw vectors gone
        data = os.path.join(vdir, "data")
        assert any(
            d.startswith("_cell=") for d in os.listdir(data)
        )
        cols = spark.read.parquet(data).columns
        assert "embedding" not in cols and "_pq" in cols

        q = [float(x) for x in e.head()["embedding"]]
        res = fs.ann_search("ip_idx", q, k=10, n_probe=3)
        # the probe reads only n_probe cells: partition filter on _cell
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "_cell" in plan
        rows = res.collect()
        assert len(rows) == 10
        # ADC candidates should strongly overlap full-PQ ADC at n_probe
        # = all cells (pruning only loses cross-cell stragglers)
        full = fs.ann_search("ip_idx", q, k=10, n_probe=8)
        a = {r["vec_id"] for r in rows}
        b = {r["vec_id"] for r in full.collect()}
        assert len(a & b) >= 6

    def test_refresh_retains_previous_generation(
        self, spark, sf_dir, tmp_path
    ):
        """ADVICE r8: pruning must keep version N-1 after a refresh so a
        lazy DataFrame resolved against the prior CURRENT can still
        execute; only N-2 and older are deleted."""
        import os

        from dbt_snowflake_feature_store_spark import FeatureStore
        from dbt_snowflake_feature_store_spark.sources import read_table

        e = read_table(spark, sf_dir, "embeddings")
        fs = FeatureStore(spark, str(tmp_path / "root"), name="GEN_FS")
        fs.build_ann_index("g_idx", e, index_type="ivf", num_centroids=8)
        v1 = fs._ann_current_dir("g_idx")
        q = [float(x) for x in e.head()["embedding"]]
        held = fs.ann_search("g_idx", q, k=5, n_probe=2)  # lazy, v1 files

        assert fs.refresh_ann_index("g_idx", e, force=True) == "REFRESHED"
        v2 = fs._ann_current_dir("g_idx")
        assert v2 != v1
        assert os.path.isdir(v1)  # previous generation retained
        assert held.count() == 5  # the outstanding plan still executes

        assert fs.refresh_ann_index("g_idx", e, force=True) == "REFRESHED"
        v3 = fs._ann_current_dir("g_idx")
        d = os.path.dirname(v3)
        vdirs = sorted(x for x in os.listdir(d) if x.startswith("v_"))
        # N and N-1 only — v1 (now N-2) pruned
        assert len(vdirs) == 2
        assert os.path.basename(v1) not in vdirs
        assert os.path.basename(v2) in vdirs
