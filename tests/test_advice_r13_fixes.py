"""Regression tests for the four ADVICE r13 findings, fixed in r14:

1. jpeg.py — a spec-legal DNL (0xFFDC) segment between the baseline
   scan and EOI must decode (T.81 B.2.5 allows exactly one, after the
   first scan); any OTHER trailing marker still rejects loudly.
2. unigram.word_count_upsert — a caller passing an n_blocks that
   disagrees with the store's persisted layout raises loudly instead
   of silently corrupting the register algebra.
3. unigram.word_count_upsert — in-batch duplicate doc_ids with no
   seq_col resolve deterministically (non-null text beats tombstone,
   then lexicographically greatest text).
4. plans/registry — a _ROUND bump without a frozen _ROUND_FRESH entry
   fails at import (assertion), so the check is exercised by the fact
   that this test file imports the registry at all; the test pins the
   invariant explicitly.
"""

import struct

import numpy as np
import pytest

from kafka_sink_azure_kusto_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from kafka_sink_azure_kusto_spark.functions.codecs import MediaDecodeError
from kafka_sink_azure_kusto_spark.functions import unigram as U


def _smooth_jpeg(h=16, w=16, quality=80):
    y, x = np.mgrid[0:h, 0:w]
    g = (128 + 40 * np.sin(x / 5.0) + 30 * np.cos(y / 7.0)).astype(np.int64)
    rgb = np.clip(np.stack([g, g, g], axis=2), 0, 255)
    return encode_jpeg(w, h, [int(v) for v in rgb.reshape(-1)], quality)


class TestJpegDnlTolerated:
    def test_dnl_before_eoi_decodes(self):
        data = _smooth_jpeg()
        assert data.endswith(b"\xff\xd9")
        dnl = b"\xff\xdc" + struct.pack(">HH", 4, 16)  # len=4, NL=16
        patched = data[:-2] + dnl + b"\xff\xd9"
        base = decode_jpeg(data)
        with_dnl = decode_jpeg(patched)
        assert np.array_equal(
            np.asarray(with_dnl.samples), np.asarray(base.samples)
        )
        assert (with_dnl.width, with_dnl.height) == (base.width, base.height)

    def test_other_trailing_marker_still_rejects(self):
        data = _smooth_jpeg()
        # an APP0 where EOI belongs is NOT the DNL exception
        app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"ab"
        with pytest.raises(MediaDecodeError, match="expected EOI"):
            decode_jpeg(data[:-2] + app0 + b"\xff\xd9")

    def test_truncated_dnl_rejects(self):
        data = _smooth_jpeg()
        with pytest.raises(MediaDecodeError):
            decode_jpeg(data[:-2] + b"\xff\xdc\x00")

    def test_malformed_dnl_length_rejects(self):
        """Spec fixes DNL's Lf to 4 — a zero length must not restart
        the marker scan inside the length field and accept the file
        (r14 self-review)."""
        data = _smooth_jpeg()
        with pytest.raises(MediaDecodeError, match="DNL segment length"):
            decode_jpeg(data[:-2] + b"\xff\xdc\x00\x00" + b"\xff\xd9")

    def test_garbage_between_dnl_and_eoi_rejects(self):
        data = _smooth_jpeg()
        dnl = b"\xff\xdc" + struct.pack(">HH", 4, 16)
        with pytest.raises(MediaDecodeError, match="after DNL"):
            decode_jpeg(data[:-2] + dnl + b"zz" + b"\xff\xd9")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, seq int")


class TestWordStoreLayoutGuard:
    def test_n_blocks_mismatch_raises(self, spark, tmp_path):
        store = str(tmp_path / "store")
        U.word_count_upsert(_docs(spark, [(0, "a b", 0)]), store, n_blocks=8)
        with pytest.raises(ValueError, match="n_blocks=8.*n_blocks=4"):
            U.word_count_upsert(
                _docs(spark, [(1, "c", 0)]), store, n_blocks=4
            )
        # matching layout still works
        st = U.word_count_upsert(
            _docs(spark, [(1, "c", 0)]), store, n_blocks=8
        )
        assert st["batch_docs"] == 1

    def test_unreadable_sidecar_raises_loudly(self, spark, tmp_path):
        store = tmp_path / "store"
        U.word_count_upsert(_docs(spark, [(0, "a", 0)]), str(store),
                            n_blocks=4)
        (store / "_n_blocks").write_text("")  # crash-truncated sidecar
        with pytest.raises(ValueError, match="unreadable _n_blocks"):
            U.word_count_upsert(
                _docs(spark, [(1, "b", 0)]), str(store), n_blocks=4
            )

    def test_pre_sidecar_store_refuses_adoption(self, spark, tmp_path):
        """Data with no sidecar = a store this code didn't create; the
        first caller's modulus must NOT get silently pinned as the
        layout (r14 self-review)."""
        store = tmp_path / "store"
        U.word_count_upsert(_docs(spark, [(0, "a", 0)]), str(store),
                            n_blocks=4)
        (store / "_n_blocks").unlink()
        with pytest.raises(ValueError, match="no _n_blocks sidecar"):
            U.word_count_upsert(
                _docs(spark, [(1, "b", 0)]), str(store), n_blocks=16
            )

    def test_guard_survives_fully_emptied_store(self, spark, tmp_path):
        """A store whose every partition was tombstoned keeps its layout
        sidecar: the next writer must still match the original modulus
        (the sidecar is hidden, so it doesn't flip the first-run probe)."""
        store = str(tmp_path / "store")
        U.word_count_upsert(_docs(spark, [(3, "x", 0)]), store, n_blocks=4)
        U.word_count_upsert(_docs(spark, [(3, None, 0)]), store, n_blocks=4)
        with pytest.raises(ValueError, match="mismatched block layout"):
            U.word_count_upsert(
                _docs(spark, [(5, "y", 0)]), store, n_blocks=16
            )


class TestDuplicateTiebreakDeterministic:
    def test_non_null_beats_tombstone_without_seq(self, spark, tmp_path):
        store = str(tmp_path / "store")
        b = _docs(spark, [(0, None, 0), (0, "alive", 0)])
        U.word_count_upsert(b, store, n_blocks=4)  # seq_col=None
        rows = {
            (r["doc_id"], r["word"]): r["cnt"]
            for r in spark.read.parquet(store).collect()
        }
        assert rows == {(0, "alive"): 1}

    def test_greatest_text_wins_and_is_stable(self, spark, tmp_path):
        for trial in range(2):
            store = str(tmp_path / f"store{trial}")
            b = _docs(
                spark, [(0, "aaa", 0), (0, "zzz", 0), (0, "mmm", 0)]
            ).repartition(8 if trial else 2)
            st = U.word_count_upsert(b, store, n_blocks=4)
            assert st["batch_docs"] == 1
            rows = {
                r["word"] for r in spark.read.parquet(store).collect()
            }
            assert rows == {"zzz"}

    def test_seq_still_outranks_tiebreak(self, spark, tmp_path):
        store = str(tmp_path / "store")
        b = _docs(spark, [(0, "zzz", 0), (0, "aaa", 1)])
        U.word_count_upsert(b, store, n_blocks=4, seq_col="seq")
        rows = {r["word"] for r in spark.read.parquet(store).collect()}
        assert rows == {"aaa"}


def test_round_fresh_frozen_for_current_round():
    from kafka_sink_azure_kusto_spark.plans import registry

    assert registry._ROUND in registry._ROUND_FRESH
    assert registry._ROUND_FRESH[registry._ROUND], "fresh list empty"
