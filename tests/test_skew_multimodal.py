"""Skew-operator guards and multimodal optional-dependency decode."""

import sys
import types

import pytest

from substreams_sink_parquet_spark.llm.multimodal import decode_audio, decode_image
from substreams_sink_parquet_spark.operators.skew import salted_join


def test_salted_join_rejects_dim_preserving_joins(spark):
    """ADVICE round 1: replicating the dim side n_salts times emits unmatched
    dim rows once per salt under right/full outer — those modes must refuse."""
    f = spark.range(5).withColumnRenamed("id", "k")
    d = spark.range(3).withColumnRenamed("id", "dk")
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(f, d, "k", "dk", fact_unique="k", how=how)
    # fact-preserving modes still work and match the plain join
    plain = f.join(d, f.k == d.dk, "left").count()
    salted = salted_join(f, d, "k", "dk", fact_unique="k", how="left").count()
    assert salted == plain


def test_media_decode_without_libs_is_explicit():
    """With no imaging/audio libs importable, decode raises a clear
    NotImplementedError naming the missing dependency."""
    if "PIL" not in sys.modules or not _importable("PIL"):
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_image(b"\x89PNG...")
    if not _importable("soundfile"):
        with pytest.raises(NotImplementedError, match="soundfile"):
            decode_audio(b"RIFF...")


def _importable(name):
    try:
        __import__(name)
        return True
    except ImportError:
        return False


def test_media_decode_uses_lib_when_present(monkeypatch):
    """When the optional lib IS importable, decode routes the payload into
    it (faked module — the real lib is absent in this container)."""
    calls = {}

    fake_image_mod = types.ModuleType("PIL.Image")

    def fake_open(buf):
        calls["image"] = buf.read()
        return "decoded-image"

    fake_image_mod.open = fake_open
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)
    assert decode_image(b"imgbytes") == "decoded-image"
    assert calls["image"] == b"imgbytes"

    fake_sf = types.ModuleType("soundfile")

    def fake_read(buf):
        calls["audio"] = buf.read()
        return ("samples", 44100)

    fake_sf.read = fake_read
    monkeypatch.setitem(sys.modules, "soundfile", fake_sf)
    assert decode_audio(b"wavbytes") == ("samples", 44100)
    assert calls["audio"] == b"wavbytes"
