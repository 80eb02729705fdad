"""Dedup suite + ANN + text functions + multimodal plumbing tests."""

import numpy as np
import pyarrow as pa
import pytest

from tantivy_ray.dedup import (
    MinHasher,
    SimHasher,
    exact_dedup,
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from tantivy_ray.dedup.simhash import hamming
from tantivy_ray.ann import IvfIndex, brute_force_cosine_topk
from tantivy_ray.functions import (
    detect_language_batch,
    fingerprint_batch,
    quality_features_batch,
)
from tantivy_ray.multimodal import (
    DecodeImageStage,
    ExtractImageFeaturesStage,
    FrameSampleStage,
    ResizeImageStage,
)

BASE = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest tonight")
NEAR = BASE + " extra"
OTHER = "completely different content about databases and query engines here"


class TestMinHashUnit:
    def test_signature_similarity_tracks_jaccard(self):
        h = MinHasher(256)
        a = h.signature(BASE.split())
        b = h.signature(NEAR.split())
        c = h.signature(OTHER.split())
        sim_ab = (a == b).mean()
        sim_ac = (a == c).mean()
        assert sim_ab > 0.7 > sim_ac

    def test_short_doc_excluded(self):
        h = MinHasher()
        assert h.signature(["a", "b"]) is None


class TestSimHashUnit:
    def test_near_docs_low_hamming(self):
        s = SimHasher()
        fa = s.fingerprint(BASE.split())
        fb = s.fingerprint(NEAR.split())
        fc = s.fingerprint(OTHER.split())
        assert hamming(fa, fb) <= 12
        assert hamming(fa, fc) > 10

    def test_deterministic(self):
        s = SimHasher()
        assert s.fingerprint(BASE.split()) == s.fingerprint(BASE.split())


@pytest.mark.usefixtures("ray_session")
class TestDedupPipelines:
    @pytest.fixture(scope="class")
    def docs_ds(self):
        import ray.data as rd

        return rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])

    def test_lsh_equals_bruteforce(self, docs_ds):
        lsh = minhash_lsh_pairs(docs_ds, threshold=0.8)
        brute = ngram_jaccard_pairs(docs_ds, threshold=0.8)
        assert lsh.equals(brute)
        assert lsh.num_rows > 0  # planted 'dup' docs

    def test_simhash_finds_planted_dups(self, docs_ds):
        pairs = simhash_pairs(docs_ds, max_distance=10)
        brute = ngram_jaccard_pairs(docs_ds, threshold=0.9)
        simhash_set = set(zip(pairs.column("id_a").to_pylist(),
                              pairs.column("id_b").to_pylist()))
        jacc_set = set(zip(brute.column("id_a").to_pylist(),
                           brute.column("id_b").to_pylist()))
        # jaccard ~0.99 pairs sit at hamming 1-5 (≈64·θ/π) — banding at
        # distance 7 is recall-exact, so every true pair must be found
        assert jacc_set <= simhash_set

    def test_exact_dedup(self, docs_ds):
        kept = exact_dedup(docs_ds).to_pandas()
        assert len(kept) == 500  # no exact dups in this corpus
        import ray.data as rd

        dup_ds = rd.from_items([
            {"doc_id": 1, "text": "same"},
            {"doc_id": 2, "text": "same"},
            {"doc_id": 3, "text": "diff"},
        ])
        kept = exact_dedup(dup_ds).to_pandas().sort_values("doc_id")
        assert kept["doc_id"].tolist() == [1, 3]


@pytest.mark.usefixtures("ray_session")
class TestAnn:
    @pytest.fixture(scope="class")
    def emb_ds(self):
        import ray.data as rd

        return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def _queries(self):
        import pyarrow.parquet as pq

        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        rows = t.slice(0, 3)
        qids = np.array(rows.column("vec_id").to_pylist())
        qm = np.stack([np.asarray(v, np.float64)
                       for v in rows.column("embedding").to_pylist()])
        return qids, qm

    def test_ivf_recall_vs_brute(self, emb_ds, tmp_path_factory):
        qids, qm = self._queries()
        brute = brute_force_cosine_topk(
            emb_ds, qids, qm, k=10, exclude_ids=set(qids.tolist()))
        store = str(tmp_path_factory.mktemp("ivf"))
        ivf = IvfIndex.build(emb_ds, store, n_lists=8, seed=11)
        # storage is centroid-partitioned parquet; reopen works
        import os

        assert any(d.startswith("centroid=") for d in os.listdir(store))
        ivf = IvfIndex.open(store)
        bp = brute.to_pandas()
        total, hit = 0, 0
        for qi, q in zip(qids, qm):
            exp = set(bp[bp.query_vec_id == qi]["vec_id"])
            got = {vid for _, vid in
                   ivf.search(q, k=10, nprobe=4, exclude=set(qids.tolist()))}
            total += len(exp)
            hit += len(exp & got)
        assert hit / total >= 0.6  # nprobe=4 of 8 lists

        # full probe = exact
        for qi, q in zip(qids, qm):
            exp = bp[bp.query_vec_id == qi]["vec_id"].tolist()
            got = [vid for _, vid in
                   ivf.search(q, k=10, nprobe=8, exclude=set(qids.tolist()))]
            assert got == exp

    def test_embedding_near_dups_lsh_path(self, emb_ds):
        exact = embedding_near_dup_pairs(emb_ds, threshold=0.4)
        lsh = embedding_near_dup_pairs(emb_ds, threshold=0.4, lsh_bits=2)
        # lsh candidates ⊆ exact; high threshold keeps most
        le = set(zip(lsh.column("id_a").to_pylist(), lsh.column("id_b").to_pylist()))
        ee = set(zip(exact.column("id_a").to_pylist(), exact.column("id_b").to_pylist()))
        assert le <= ee

    def test_embedding_lsh_recall_at_contract_threshold(self, ray_session):
        """VERDICT round-3 item 6: banded LSH (the above-cutoff default)
        recalls >=90% of the exact pairs at the contract threshold on a
        clustered corpus with planted near-duplicates."""
        import ray.data as rd

        rng = np.random.default_rng(42)
        dim, n_base = 16, 300
        base = rng.normal(size=(n_base, dim))
        rows = []
        vid = 0
        for i in range(n_base):
            rows.append({"vec_id": vid, "embedding": base[i].tolist()})
            vid += 1
            if i % 3 == 0:  # planted near-dup: tiny perturbation
                rows.append({"vec_id": vid,
                             "embedding": (base[i] + 0.02 * rng.normal(
                                 size=dim)).tolist()})
                vid += 1
        ds = rd.from_items(rows)
        exact = embedding_near_dup_pairs(ds, threshold=0.9,
                                         method="block_exact")
        lsh = embedding_near_dup_pairs(ds, threshold=0.9, method="lsh",
                                       lsh_bits=8, lsh_tables=16)
        ee = set(zip(exact.column("id_a").to_pylist(),
                     exact.column("id_b").to_pylist()))
        le = set(zip(lsh.column("id_a").to_pylist(),
                     lsh.column("id_b").to_pylist()))
        assert len(ee) >= 50          # the plant worked
        assert le <= ee               # no false positives (pairs verified)
        assert len(le & ee) / len(ee) >= 0.9, len(le & ee) / len(ee)

    def test_embedding_auto_method_cutoff(self, ray_session):
        """Auto-selection: small input takes the exact path, and a tiny
        exact_max_rows cutoff flips the same input to LSH."""
        import ray.data as rd

        rng = np.random.default_rng(3)
        rows = [{"vec_id": i, "embedding": rng.normal(size=8).tolist()}
                for i in range(40)]
        ds = rd.from_items(rows)
        a = embedding_near_dup_pairs(ds, threshold=0.5)
        b = embedding_near_dup_pairs(ds, threshold=0.5, exact_max_rows=10,
                                     lsh_tables=24, lsh_bits=4)
        ea = set(zip(a.column("id_a").to_pylist(),
                     a.column("id_b").to_pylist()))
        eb = set(zip(b.column("id_a").to_pylist(),
                     b.column("id_b").to_pylist()))
        assert eb <= ea  # LSH candidates are exact-verified pairs


class TestTextFunctions:
    def test_langid(self):
        arr = pa.array([
            "the quick fox is not a dog",
            "der hund ist nicht auf dem tisch und das ist gut",
            "le chat est dans la maison avec les enfants",
            "el perro es un animal que vive en la casa",
            "Русский текст и не только он",
            "",
            "zzz qqq www",
        ])
        langs = detect_language_batch(arr).to_pylist()
        assert langs[:5] == ["en", "de", "fr", "es", "ru"]
        assert langs[5] == "und"

    def test_quality_features(self):
        t = quality_features_batch(pa.array([
            "The quick brown fox!", "", "a b c 123 456",
        ]))
        d = t.to_pydict()
        assert d["num_tokens"] == [4, 0, 5]
        assert d["stop_ratio"][0] == pytest.approx(0.25)  # 'the'
        assert d["digit_ratio"][2] > 0.4

    def test_fingerprints_normalization(self):
        t = fingerprint_batch(pa.array(["Hello, World!", "hello world"]))
        assert t.column("md5_fp")[0] == t.column("md5_fp")[1]
        assert t.column("roll_fp")[0] == t.column("roll_fp")[1]


@pytest.mark.usefixtures("ray_session")
class TestMultimodal:
    def test_decode_resize_extract_pipeline(self):
        import ray.data as rd

        ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                             columns=["doc_id", "text"])
        ds = ds.map_batches(
            lambda t: t.append_column(
                "html", pa.array([x.encode() for x in t.column("text").to_pylist()],
                                 type=pa.binary())),
            batch_format="pyarrow")
        out = (
            ds.limit(50)
            .map_batches(DecodeImageStage(32, 32), batch_format="pyarrow",
                         batch_size=16, concurrency=2)
            .map_batches(ResizeImageStage((32, 32), (16, 16)),
                         batch_format="pyarrow", batch_size=16)
            .map_batches(ExtractImageFeaturesStage((16, 16)),
                         batch_format="pyarrow", batch_size=16)
        )
        tbl = pa.Table.from_pandas(out.to_pandas())
        assert tbl.num_rows == 50
        feats = tbl.column("image_features")[0].as_py()
        assert len(feats) == 6  # 3 means + 3 stds

    def test_decode_deterministic(self):
        a = DecodeImageStage(8, 8)
        t = pa.table({"html": pa.array([b"xyz"], type=pa.binary())})
        r1 = a(t).column("image")[0].as_py()
        r2 = a(t).column("image")[0].as_py()
        assert r1 == r2

    def test_strict_mode_raises(self):
        a = DecodeImageStage(8, 8, strict=True)
        t = pa.table({"html": pa.array([b"xyz"], type=pa.binary())})
        with pytest.raises(NotImplementedError):
            a(t)
        f = FrameSampleStage(strict=True)
        with pytest.raises(NotImplementedError):
            f(t)

    def test_frame_sampling(self):
        f = FrameSampleStage(num_frames=3)
        t = pa.table({"html": pa.array([b"vid1", b"vid2"], type=pa.binary())})
        out = f(t)
        frames = out.column("frames").to_pylist()
        assert len(frames[0]) == 3
        assert frames[0] != frames[1]


class TestImageCodecs:
    """Real codec path (multimodal/codecs.py): netpbm + BMP roundtrips
    and the decode stage consuming genuinely-encoded payloads."""

    def test_ppm_roundtrip(self):
        from tantivy_ray.multimodal.codecs import decode_ppm, encode_ppm

        rs = np.random.RandomState(1)
        img = rs.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(img)) == img).all()
        gray = rs.randint(0, 256, size=(4, 9), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(gray)) == gray).all()

    def test_ppm_comment_header(self):
        from tantivy_ray.multimodal.codecs import decode_ppm

        px = bytes(range(12))
        data = b"P6\n# a comment\n2 2\n255\n" + px
        img = decode_ppm(data)
        assert img.shape == (2, 2, 3) and img.ravel().tolist() == list(px)

    def test_bmp_roundtrip(self):
        from tantivy_ray.multimodal.codecs import decode_bmp, encode_bmp

        rs = np.random.RandomState(2)
        # non-multiple-of-4 width exercises row padding
        img = rs.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()

    def test_decode_stage_real_path(self):
        from tantivy_ray.multimodal import DecodeImageStage
        from tantivy_ray.multimodal.codecs import encode_bmp, encode_ppm

        rs = np.random.RandomState(3)
        img = rs.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
        batch = pa.table({
            "html": pa.array([encode_ppm(img), encode_bmp(img)],
                             type=pa.binary()),
        })
        # strict=True: REAL formats decode fine (no codec stub hit)
        stage = DecodeImageStage(width=4, height=4, strict=True)
        out = stage(batch)
        flat = out.column("image").combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        decoded = flat.reshape(2, 4, 4, 3)
        yi = np.arange(4) * 8 // 4
        exp = img[yi[:, None], yi[None, :], :]
        assert (decoded[0] == exp).all() and (decoded[1] == exp).all()

    def test_strict_raises_on_compressed(self):
        from tantivy_ray.multimodal import DecodeImageStage

        batch = pa.table({"html": pa.array([b"\x89PNG...."],
                                           type=pa.binary())})
        with pytest.raises(NotImplementedError):
            DecodeImageStage(strict=True)(batch)


@pytest.mark.usefixtures("ray_session")
class TestAudioCodecs:
    """Real WAV codec + DSP features (multimodal/audio.py)."""

    def _tone(self, freq=440.0, rate=8000, secs=0.25):
        t = np.arange(int(rate * secs)) / rate
        return np.sin(2 * np.pi * freq * t) * 0.5, rate

    def test_wav_roundtrip(self):
        from tantivy_ray.multimodal.audio import decode_wav, encode_wav

        x, rate = self._tone()
        x2, rate2 = decode_wav(encode_wav(x, rate))
        assert rate2 == rate and len(x2) == len(x)
        assert np.abs(x2 - x).max() < 1e-3   # 16-bit quantization

    def test_features_track_frequency(self):
        from tantivy_ray.multimodal.audio import (audio_features,
                                                  decode_wav, encode_wav)

        lo, rate = self._tone(200.0)
        hi, _ = self._tone(2000.0)
        f_lo = audio_features(decode_wav(encode_wav(lo, rate))[0], rate)
        f_hi = audio_features(decode_wav(encode_wav(hi, rate))[0], rate)
        # spectral centroid follows the tone frequency
        assert abs(f_lo[4] - 200) < 30
        assert abs(f_hi[4] - 2000) < 150
        # zero-crossing rate too
        assert f_hi[3] > f_lo[3]

    def test_stage_pipeline(self):
        import ray.data as rd

        from tantivy_ray.multimodal.audio import (DecodeAudioStage,
                                                  ExtractAudioFeaturesStage,
                                                  encode_wav)

        rows = []
        for f in (220.0, 880.0, 1760.0):
            x, rate = self._tone(f)
            rows.append({"audio": encode_wav(x, rate)})
        ds = rd.from_items(rows)
        out = (ds.map_batches(DecodeAudioStage(strict=True),
                              batch_format="pyarrow", batch_size=2)
                 .map_batches(ExtractAudioFeaturesStage(),
                              batch_format="pyarrow"))
        t = out.take_all()
        assert len(t) == 3
        cents = [r["audio_features"][4] for r in t]
        assert cents == sorted(cents)  # centroid rises with frequency

    def test_strict_raises_on_compressed(self):
        from tantivy_ray.multimodal.audio import DecodeAudioStage

        batch = pa.table({"audio": pa.array([b"ID3\x04mp3data"],
                                            type=pa.binary())})
        with pytest.raises(NotImplementedError):
            DecodeAudioStage(strict=True)(batch)


class TestVecMatrixAndLshSizing:
    """ADVICE r3: offset-aware vector decode + recall-aware LSH tables."""

    def test_vec_matrix_sliced_column(self):
        import numpy as np

        from tantivy_ray.dedup.embedding import _vec_matrix

        arr = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]],
                       type=pa.list_(pa.float64()))
        m = _vec_matrix(arr.slice(1, 2))
        assert np.allclose(m, [[3.0, 4.0], [5.0, 6.0]])

    def test_vec_matrix_rejects_ragged_and_null(self):
        from tantivy_ray.dedup.embedding import _vec_matrix

        with pytest.raises(ValueError, match="ragged"):
            _vec_matrix(pa.array([[1.0, 2.0], [3.0]],
                                 type=pa.list_(pa.float64())))
        with pytest.raises(ValueError, match="null"):
            _vec_matrix(pa.array([[1.0, 2.0], None],
                                 type=pa.list_(pa.float64())))

    def test_auto_tables_track_bits(self):
        from tantivy_ray.dedup.embedding import (_auto_lsh_tables,
                                                 lsh_expected_recall)

        prev = 0
        for bits in (8, 12, 16):
            tables = _auto_lsh_tables(0.9, bits)
            assert tables >= prev  # tables grow with bits
            assert lsh_expected_recall(0.9, bits, tables) >= 0.95
            prev = tables
        # past the cap: bounded fan-out, recall shortfall is the
        # documented trade (logged at runtime)
        assert _auto_lsh_tables(0.9, 24) == 64


class TestPrefixFilterAllPairs:
    """jaccard_allpairs_prefix must reproduce the brute-force exact pair
    set — the prefix filter and length filter are LOSSLESS."""

    def _parity(self, ray_session, cap):
        import ray.data as rd

        from tantivy_ray.dedup import jaccard_allpairs_prefix
        from tantivy_ray.dedup.minhash import ngram_jaccard_pairs

        ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                             columns=["doc_id", "text"],
                             override_num_blocks=3)
        got = jaccard_allpairs_prefix(ds, threshold=0.8,
                                      broadcast_vocab_cap=cap).to_pandas()
        ds2 = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                              columns=["doc_id", "text"],
                              override_num_blocks=3)
        want = ngram_jaccard_pairs(ds2, threshold=0.8).to_pandas()
        assert got[["id_a", "id_b"]].values.tolist() == \
            want[["id_a", "id_b"]].values.tolist()
        assert (abs(got["jaccard"] - want["jaccard"]) < 1e-9).all()
        assert len(got) > 0  # the synthetic table plants duplicates

    def test_parity_df_order(self, ray_session):
        self._parity(ray_session, cap=5_000_000)

    def test_parity_rarity_join_fallback(self, ray_session):
        # vocab cap 0 forces the no-broadcast distributed df-join path
        self._parity(ray_session, cap=0)

    def test_lower_threshold_parity(self, ray_session):
        import ray.data as rd

        from tantivy_ray.dedup import jaccard_allpairs_prefix
        from tantivy_ray.dedup.minhash import ngram_jaccard_pairs

        ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                             columns=["doc_id", "text"],
                             override_num_blocks=2)
        got = jaccard_allpairs_prefix(ds, threshold=0.5).to_pandas()
        ds2 = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                              columns=["doc_id", "text"],
                              override_num_blocks=2)
        want = ngram_jaccard_pairs(ds2, threshold=0.5).to_pandas()
        assert got[["id_a", "id_b"]].values.tolist() == \
            want[["id_a", "id_b"]].values.tolist()
