"""Real-Pillow decode tests for the multimodal seam — the same gated pattern
as tests/test_delta_store.py: the whole module skips when Pillow is absent
(this container, by design). On an image-lib-equipped deployment these run
and prove the real decoder drops into the existing Arrow plumbing unchanged.
"""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _png(w: int, h: int, color: int) -> bytes:
    buf = io.BytesIO()
    Image.new("L", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def assets(spark):
    from lakehouse_plumber_spark.llm.multimodal import ASSET_SCHEMA

    rows = [
        (1, "image", _png(32, 16, 0), "image/png", 32, 16, None),
        (2, "image", _png(8, 8, 255), "image/png", 8, 8, None),
        (3, "image", None, None, None, None, None),
        # non-image payload: the real decoder must NOT try Image.open on it
        (4, "audio", b"\x00\x01riff-ish", "audio/wav", None, None, 1200),
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_pil_decoder_resolves_and_extracts_real_grid(spark, assets):
    from lakehouse_plumber_spark.llm.multimodal import extract_features, image_decoder

    name, _ = image_decoder("auto")
    assert name == "pil"
    out = {r.asset_id: r for r in extract_features(assets, decoder="pil").collect()}
    # 8x8 grayscale grid: 64 values, black image -> all 0.0, white -> all 1.0
    assert [round(v, 6) for v in out[1].feature] == [0.0] * 64
    assert [round(v, 6) for v in out[2].feature] == [1.0] * 64
    assert out[3].feature == []
    assert out[4].feature == []  # audio: no image decoder, not a crash


def test_pil_resize_really_resizes(spark, assets):
    from lakehouse_plumber_spark.llm.multimodal import resize_images

    out = {
        r.asset_id: r
        for r in resize_images(assets, width=4, height=6, decoder="pil").collect()
    }
    for aid in (1, 2):
        with Image.open(io.BytesIO(out[aid].content)) as im:
            assert im.size == (4, 6)
        assert out[aid].mime_type == "image/png"
        assert (out[aid].width, out[aid].height) == (4, 6)
    # null content keeps its (null) mime; audio passes through untouched
    assert out[3].content is None and out[3].mime_type is None
    assert out[4].content == b"\x00\x01riff-ish" and out[4].mime_type == "audio/wav"
