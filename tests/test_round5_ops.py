"""Semantic invariants for the round-5 operators, beyond oracle parity:
the general WKB codec roundtrips every geometry class bit-exactly and
rejects malformed payloads instead of misreading them."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _decode_one(spark, payload: bytes):
    from parquet_importer_spark.sources.spatial import wkb_geom_decode

    df = spark.createDataFrame([(payload,)], "wkb binary")
    return df.select(wkb_geom_decode(F.col("wkb")).alias("g")).first().g


def test_wkb_geom_roundtrip_all_types(spark):
    """encode→decode is the identity for Point, LineString, and Polygon
    (including a polygon with a hole), with doubles preserved exactly."""
    from parquet_importer_spark.sources.spatial import (
        wkb_geom_decode,
        wkb_geom_encode,
    )

    cases = [
        ("Point", [[(1.5, -2.25)]]),
        ("LineString", [[(0.0, 0.0), (10.125, -5.5), (7.0, 3.75)]]),
        (
            "Polygon",
            [
                [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
                [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 1.0)],
            ],
        ),
    ]
    rows = [
        (
            gt,
            [[{"lon": x, "lat": y} for x, y in ring] for ring in rings],
        )
        for gt, rings in cases
    ]
    df = spark.createDataFrame(
        rows,
        "gtype string, rings array<array<struct<lon:double,lat:double>>>",
    )
    back = df.select(
        "gtype",
        "rings",
        wkb_geom_decode(
            wkb_geom_encode(F.col("gtype"), F.col("rings"))
        ).alias("g"),
    ).collect()
    assert len(back) == 3
    for r in back:
        assert r.g.gtype == r.gtype
        got = [[(p.lon, p.lat) for p in ring] for ring in r.g.rings]
        want = [[(p.lon, p.lat) for p in ring] for ring in r.rings]
        assert got == want, f"{r.gtype} vertices drifted"


def test_wkb_geom_decode_big_endian(spark):
    """The decoder honors the byte-order marker: a big-endian LineString
    decodes identically to its little-endian twin."""
    pts = [(1.0, 2.0), (3.0, 4.0)]
    be = struct.pack(">BII", 0, 2, len(pts)) + b"".join(
        struct.pack(">dd", x, y) for x, y in pts
    )
    g = _decode_one(spark, be)
    assert g.gtype == "LineString"
    assert [(p.lon, p.lat) for p in g.rings[0]] == pts


def test_wkb_geom_decode_rejects_malformed(spark):
    """Unknown geometry codes, truncated buffers, trailing garbage, and
    EWKB flag bits all decode to NULL — never to a wrong geometry."""
    point = struct.pack("<BIdd", 1, 1, 1.0, 2.0)
    bad = [
        struct.pack("<BIdd", 1, 7, 1.0, 2.0),  # MultiPolygon unsupported
        point[:-4],  # truncated
        point + b"\x00",  # trailing byte
        struct.pack("<BIdd", 1, 0x80000001, 1.0, 2.0),  # 2.5D flag
        b"",
    ]
    for payload in bad:
        g = _decode_one(spark, payload)
        assert g is None or g.gtype is None, f"accepted malformed {payload!r}"


def test_spatial_roundtrip_query_exact(spark):
    """The registered spatial_wkb_roundtrip query reports one row per
    geometry class with zero decode failures and full exactness."""
    from parquet_importer_spark.suite import QUERIES

    rows = {
        r.gtype: r
        for r in QUERIES["spatial_wkb_roundtrip"](spark, SF).collect()
    }
    assert set(rows) == {"Point", "LineString", "Polygon"}
    for gt, r in rows.items():
        assert r.n_decode_failures == 0, gt
        assert r.n_exact_roundtrip == r.n_rows, gt


# ---------------------------------------------------------------------------
# round-5 operator invariants over PLANTED fixtures: each test writes a
# tiny documents/embeddings/orders parquet into tmp_path and runs the
# registered query against it — probing the mathematical guarantee the
# operator advertises, which oracle parity on random data cannot.

import hashlib
import os

import pandas as pd
import pytest


def _write(tmp_path, name, pdf):
    path = os.path.join(str(tmp_path), f"{name}.parquet")
    pdf.to_parquet(path, index=False)
    return str(tmp_path)


def _split_of(doc_id: int) -> str:
    b = hashlib.md5(f"s9|{doc_id}".encode()).hexdigest()[:2]
    return "train" if b < "cc" else "test"


def _ids_by_split(n=5000):
    train = [i for i in range(n) if _split_of(i) == "train"]
    test = [i for i in range(n) if _split_of(i) == "test"]
    return train, test


def test_affine_minhash_pairs_planted_duplicate(spark, tmp_path):
    """Two identical documents share every band key at ANY profile —
    the affine family must emit the pair with jaccard 1.0."""
    from parquet_importer_spark.operators.dedup import (
        affine_minhash_lsh_pairs,
    )

    rows = [(1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "entirely different words appear here now"),
            (4, "yet another unrelated document text body")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = affine_minhash_lsh_pairs(
        df, "text", "doc_id", num_hashes=128, bands=16,
        jaccard_threshold=0.5, k=2,
    ).collect()
    pairs = {(r.id_1, r.id_2): r for r in out}
    assert (1, 2) in pairs
    assert pairs[(1, 2)].jaccard == 1.0
    assert pairs[(1, 2)].n_shared_bands == 16


def test_semdedup_drops_exactly_one_of_identical_pair(spark, tmp_path):
    """Identical embeddings land in one cluster with cosine 1 ≥ τ —
    exactly one of the two must be dropped, and every other vector
    (orthogonal to everything) survives."""
    from parquet_importer_spark.suite import QUERIES

    dim = 8
    def unit(i):
        v = [0.0] * dim
        v[i % dim] = 1.0
        return v
    rows = [(i, unit(i), 0) for i in range(8)]
    # planted identical pair: vec 20 and 21 both equal axis-0 + axis-1
    dup = [0.7, 0.7, 0, 0, 0, 0, 0, 0]
    rows += [(20, dup, 0), (21, dup, 0)]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    sf = _write(tmp_path, "embeddings", pdf)
    out = {r.vec_id: r.keep for r in QUERIES["llm_semdedup"](spark, sf).collect()}
    assert out[20] != out[21], "exactly one of the identical pair survives"
    assert out[20] or out[21]


def test_ngram_perplexity_unseen_scores_higher(spark, tmp_path):
    """A test doc of train-frequent bigrams must score lower avg_nll
    than a test doc of bigrams never seen in train."""
    from parquet_importer_spark.suite import QUERIES

    train, test = _ids_by_split()
    fluent = "the cat sat on the mat"
    rows = [(i, fluent, "en", "web", len(fluent)) for i in train[:40]]
    rows.append((test[0], fluent, "en", "web", len(fluent)))
    gibberish = "zq xv qj vx jz wq"
    rows.append((test[1], gibberish, "en", "web", len(gibberish)))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = _write(tmp_path, "documents", pdf)
    out = {
        r.doc_id: r.avg_nll
        for r in QUERIES["llm_ngram_perplexity"](spark, sf).collect()
    }
    assert out[test[0]] < out[test[1]], (
        f"fluent {out[test[0]]} must beat gibberish {out[test[1]]}"
    )
    assert all(v > 0 for v in out.values())


def test_bpe_merge_learns_planted_pair_and_compresses(spark, tmp_path):
    """On a corpus dominated by words containing 'ab', the first merge
    must be 'a b'; applying merges never increases symbol count."""
    from parquet_importer_spark.suite import QUERIES

    rows = [(i, "abab abba cab", "en", "web", 13) for i in range(30)]
    rows += [(100 + i, "xy zw", "en", "web", 5) for i in range(3)]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = _write(tmp_path, "documents", pdf)
    merges = {r.round: r for r in QUERIES["llm_bpe_merge"](spark, sf).collect()}
    assert merges[1].pair == "a b", merges
    tok = QUERIES["llm_bpe_tokenize"](spark, sf).collect()
    assert tok
    for r in tok:
        assert r.n_bpe_syms <= r.n_char_syms
        assert r.compression >= 1.0


def test_decontam_substring_flags_planted_copy(spark, tmp_path):
    """A test doc copying a verbatim 8-token span from a train doc is
    contaminated; an unrelated test doc is retained."""
    from parquet_importer_spark.suite import QUERIES

    train, test = _ids_by_split()
    span = "one two three four five six seven eight"
    rows = [(train[0], f"prefix {span} suffix", "en", "web", 1)]
    rows.append((test[0], f"stolen {span} indeed", "en", "web", 1))
    rows.append((test[1], "totally novel words nobody wrote before "
                          "in any training document ever", "en", "web", 1))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = _write(tmp_path, "documents", pdf)
    out = QUERIES["llm_decontam_substring"](spark, sf).collect()
    assert len(out) == 1 and out[0].source == "web"
    assert out[0].n_test_docs == 2
    assert out[0].n_contaminated == 1
    assert out[0].retention_rate == 0.5


def test_quality_calibrated_is_uniform_within_source(spark):
    """Within every source, calibrated scores are exactly the uniform
    grid {0, 1/(n−1), …, 1} and order-isomorphic to (quality, doc_id)."""
    from parquet_importer_spark.suite import QUERIES

    rows = QUERIES["llm_quality_calibrated"](spark, SF).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, grp in by_source.items():
        n = len(grp)
        grid = sorted(round(i / (n - 1), 6) for i in range(n))
        assert sorted(r.calibrated for r in grp) == grid, source
        ordered = sorted(grp, key=lambda r: (r.quality, r.doc_id))
        assert [r.calibrated for r in ordered] == [
            round(i / (n - 1), 6) for i in range(n)
        ], source


def test_gaps_islands_planted_streaks(spark, tmp_path):
    """Customer with days {d, d+1, d+2, d+10, d+11} → longest streak 3,
    2 islands; duplicate same-day orders must not inflate streaks."""
    import datetime

    from parquet_importer_spark.suite import QUERIES

    d0 = datetime.date(2024, 1, 1)
    days = [0, 1, 2, 10, 11]
    rows = [(7, d0 + datetime.timedelta(days=k)) for k in days]
    rows.append((7, d0))  # same-day duplicate order
    rows.append((8, d0))  # singleton customer
    pdf = pd.DataFrame(rows, columns=["o_custkey", "o_orderdate"])
    sf = _write(tmp_path, "orders", pdf)
    out = {r.o_custkey: r for r in QUERIES["win_gaps_islands"](spark, sf).collect()}
    assert out[7].longest_streak == 3 and out[7].n_islands == 2
    assert out[7].first_order_day == d0
    assert out[8].longest_streak == 1 and out[8].n_islands == 1


def test_bottomk_catches_small_in_large_containment(spark, tmp_path):
    """A 10-token doc fully embedded in a 120-token doc has Jaccard
    ≈ 0.08 — invisible to symmetric banding at any sane knee — but
    bottom-k probing must catch it with containment 1.0."""
    from parquet_importer_spark.suite import QUERIES

    big_words = [f"w{i}" for i in range(120)]
    big = " ".join(big_words)
    small = " ".join(big_words[50:60])
    rows = [
        (1, big, "en", "web", len(big)),
        (2, small, "en", "web", len(small)),
        (3, "completely unrelated tokens that never overlap anything",
         "en", "web", 1),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = _write(tmp_path, "documents", pdf)
    out = {(r.id_1, r.id_2): r for r in QUERIES["llm_dedup_bottomk"](spark, sf).collect()}
    assert (1, 2) in out, f"contained pair missed: {out}"
    r = out[(1, 2)]
    assert r.containment_2in1 == 1.0  # small (id 2) fully inside big
    assert r.jaccard < 0.15


def test_pq_query_encodes_to_itself(spark):
    """vec 0 is both the query and sub-codebook centroid 0, so its ADC
    distance is exactly 0 and it must rank first; all ADC distances are
    nonnegative."""
    from parquet_importer_spark.suite import QUERIES

    rows = QUERIES["llm_sim_pq"](spark, SF).collect()
    assert rows[0].vec_id == 0 and rows[0].approx_dist == 0.0
    assert all(r.approx_dist >= 0 for r in rows)


def test_emb_whiten_planted_moments(spark, tmp_path):
    """Constant dimension → std 0 and whitened 0; a {0,2} dimension →
    mean 1, std 1, query standardized exactly."""
    from parquet_importer_spark.suite import QUERIES

    rows = [
        (0, [1.0, 0.0, 5.0], 0),
        (1, [1.0, 2.0, 7.0], 0),
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    sf = _write(tmp_path, "embeddings", pdf)
    out = {r.pos: r for r in QUERIES["llm_emb_whiten"](spark, sf).collect()}
    assert out[0].std == 0.0 and out[0].q_whitened == 0.0
    assert out[1].mean == 1.0 and out[1].std == 1.0
    assert out[1].q_whitened == -1.0  # q dim-1 value 0 → (0−1)/1
    assert out[2].mean == 6.0 and out[2].std == 1.0
    assert out[2].q_whitened == -1.0


def test_interval_bucketed_planted_overlap_and_dedup(spark, tmp_path):
    """A click/purchase pair overlapping across a bucket boundary must
    appear exactly ONCE with the exact overlap; disjoint and
    other-user pairs must not appear."""
    import datetime

    from parquet_importer_spark.suite import QUERIES

    t0 = datetime.datetime(2024, 1, 1, 0, 8, 0)  # straddles 0:00/0:10 grid
    rows = [
        (1, 7, "click", 0.0, t0),
        (2, 7, "purchase", 0.0, t0 + datetime.timedelta(minutes=5)),
        (3, 7, "purchase", 0.0, t0 + datetime.timedelta(minutes=30)),
        (4, 8, "purchase", 0.0, t0 + datetime.timedelta(minutes=5)),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "value", "ts"]
    )
    sf = _write(tmp_path, "events", pdf)
    out = QUERIES["join_interval_bucketed"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.click_id, r.purchase_id) == (7, 1, 2)
    assert r.overlap_sec == 300  # 10-min windows offset by 5 min


def test_transform_with_state_matches_batch_totals(spark):
    """The stateful streaming totals must equal the same aggregation
    computed in one batch pass — state rolled across micro-batches
    loses nothing (integer-cents accumulation is order-exact)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from parquet_importer_spark.io import read_table
    from parquet_importer_spark.suite import QUERIES

    got = {
        r.user_id: (r.n_events, r.total_cents)
        for r in QUERIES["stream_transform_with_state"](spark, SF).collect()
    }
    # groundtruth batch pass: per-partition int-cent sums then total —
    # same quantize-then-sum arithmetic as the stateful path
    ev = read_table(spark, SF, "events").toPandas()
    want = {}
    for uid, grp in ev.groupby("user_id"):
        want[int(uid)] = (
            len(grp),
            int(
                (grp["value"].astype(float) * 100)
                .round()
                .astype("int64")
                .sum()
            ),
        )
    assert got == want


def test_line_dedup_first_occurrence_and_within_doc(spark, tmp_path):
    """A 3-token line survives only in its minimal doc_id; a line
    repeated INSIDE one doc keeps only its first position."""
    from parquet_importer_spark.suite import QUERIES

    rows = [
        (1, "a b c d e f"),          # lines: "a b c", "d e f"
        (2, "a b c x y z"),          # "a b c" duplicates doc 1's line
        (3, "p q r p q r"),          # same line twice within one doc
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sf = _write(tmp_path, "documents", pdf)
    out = {r.doc_id: r for r in QUERIES["llm_line_dedup"](spark, sf).collect()}
    assert out[1].n_lines == 2 and out[1].n_kept == 2
    assert out[2].n_lines == 2 and out[2].n_kept == 1
    assert out[3].n_lines == 2 and out[3].n_kept == 1
    assert out[2].kept_ratio == 0.5


def test_dsir_weights_target_like_scores_higher(spark, tmp_path):
    """A non-English doc written from target-frequent bigrams must
    out-score one built from bigrams the target never uses."""
    from parquet_importer_spark.suite import QUERIES

    en = [(i, "alpha beta gamma delta epsilon", "en") for i in range(10)]
    other = [(100 + i, "zork quux blarg fnord wibble", "de") for i in range(10)]
    probe_like = [(200, "alpha beta gamma delta", "de")]
    probe_unlike = [(201, "zork quux blarg fnord", "de")]
    pdf = pd.DataFrame(
        en + other + probe_like + probe_unlike,
        columns=["doc_id", "text", "lang"],
    )
    sf = _write(tmp_path, "documents", pdf)
    out = {r.doc_id: r.avg_llr for r in QUERIES["llm_dsir_weights"](spark, sf).collect()}
    assert out[200] > out[201]
    assert out[0] > out[100]


def test_char_entropy_exact_extremes(spark, tmp_path):
    """Single-character text has entropy 0; a 4-char uniform alphabet
    hits ln(4) exactly (round-6)."""
    from parquet_importer_spark.suite import QUERIES

    pdf = pd.DataFrame(
        [(1, "aaaa"), (2, "a b c d"), (3, "abab")],
        columns=["doc_id", "text"],
    )
    sf = _write(tmp_path, "documents", pdf)
    out = {r.doc_id: r for r in QUERIES["llm_char_entropy"](spark, sf).collect()}
    assert out[1].entropy == 0.0 and out[1].n_distinct_chars == 1
    assert abs(out[2].entropy - 1.386294) < 1e-6   # ln(4), whitespace stripped
    assert abs(out[3].entropy - 0.693147) < 1e-6   # ln(2)
    assert out[2].n_chars_nospace == 4


def test_triangle_count_planted_triangle(spark, tmp_path):
    """Suppliers 1-2-3 co-occur in 10 orders per pair — more than one
    σ above the mean over the 8 observed pairs — while five stray
    pairs co-occur once each: exactly one triangle, counted once per
    member, and every below-threshold node is excluded entirely."""
    from parquet_importer_spark.suite import QUERIES

    rows = []
    for ok in range(101, 111):
        rows += [(ok, 1), (ok, 2), (ok, 3)]
    for ok, (u, v) in zip(
        range(201, 206), [(1, 4), (2, 5), (3, 6), (4, 5), (5, 6)]
    ):
        rows += [(ok, u), (ok, v)]
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_suppkey"])
    sf = _write(tmp_path, "lineitem", pdf)
    out = {r.suppkey: r for r in QUERIES["graph_triangle_count"](spark, sf).collect()}
    # co-counts: 3 pairs at 10, 5 pairs at 1 → n=8, Σc=35, Σc²=305;
    # c=10: (80−35)² = 2025 > 8·305 − 35² = 1215 → edge; c=1: 8 < 35 → not
    assert set(out) == {1, 2, 3}
    for k in (1, 2, 3):
        assert out[k].n_triangles == 1 and out[k].degree == 2


def test_seasonal_decompose_constant_series_is_all_trend(spark, tmp_path):
    """A constant series decomposes to trend == value, seasonal == 0,
    residual == 0 at every bucket."""
    from datetime import datetime, timedelta

    from parquet_importer_spark.suite import QUERIES

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(hours=i), 7, "click", 10.0, "{}")
        for i in range(48)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = _write(tmp_path, "events", pdf)
    out = QUERIES["ts_seasonal_decompose"](spark, sf).collect()
    assert len(out) == 48
    for r in out:
        assert r.mean_v == 10.0
        assert r.trend == 10.0
        assert r.seasonal == 0.0
        assert r.residual == 0.0


def test_ewma_constant_series_is_identity(spark, tmp_path):
    """Dyadic weights renormalize to 1, so a constant series smooths
    to itself exactly at every window size — including the ramp-up
    rows where the frame holds fewer than 16 points."""
    from datetime import datetime, timedelta

    from parquet_importer_spark.suite import QUERIES

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(minutes=i), 1, "click", 7.25, "{}")
        for i in range(40)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = _write(tmp_path, "events", pdf)
    out = QUERIES["ts_ewma"](spark, sf).collect()
    assert len(out) == 40
    for r in out:
        assert r.ewma == 7.25
        assert r.n_window == min(r.event_id + 1, 16)


def test_ewma_newest_dominates(spark, tmp_path):
    """After a step 0 → 100 the EWMA must sit strictly above 50 on the
    first post-step row (newest weight is half the mass) and approach
    100 monotonically."""
    from datetime import datetime, timedelta

    from parquet_importer_spark.suite import QUERIES

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(minutes=i), 1, "click",
         0.0 if i < 20 else 100.0, "{}")
        for i in range(40)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = _write(tmp_path, "events", pdf)
    out = {r.event_id: r.ewma for r in QUERIES["ts_ewma"](spark, sf).collect()}
    assert out[19] == 0.0
    assert out[20] > 50.0
    assert out[20] < out[21] < out[22] <= 100.0


def test_url_blocklist_blocks_exactly_planted_source(spark, tmp_path):
    """Docs whose synthesized host is on the blocklist (source src3)
    are blocked regardless of the WWW./utm URL variant; an off-list
    source (src1) survives untouched."""
    from parquet_importer_spark.suite import QUERIES

    rows = [(i, "some text", "en", "src3" if i < 6 else "src1")
            for i in range(10)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    sf = _write(tmp_path, "documents", pdf)
    out = {r.lang: r for r in QUERIES["llm_url_blocklist"](spark, sf).collect()}
    assert out["en"].n_docs == 10
    assert out["en"].n_blocked == 6
    assert out["en"].retention_rate == 0.4
