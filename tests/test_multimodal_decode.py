"""The real-image-decode env gate (multimodal.decode_image / RealDecoder).

In containers WITHOUT Pillow the gate must raise NotImplementedError
loudly (never a silent fake); WITH Pillow the real path must decode
actual image bytes and emit FakeDecoder's exact output schema — so the
gate is exercised in every environment, whichever side it lands on."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest

from ray_cdc_lake.multimodal import BINARY_SCHEMA, FakeDecoder, RealDecoder, decode_image

try:
    import PIL  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _bin_batch(payloads: list[bytes]) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array(range(len(payloads)), type=pa.int64()),
            pa.array(payloads, type=pa.binary()),
            pa.array(["image/png"] * len(payloads), type=pa.string()),
            pa.array([len(p) for p in payloads], type=pa.int64()),
        ],
        schema=BINARY_SCHEMA,
    )


@pytest.mark.skipif(HAVE_PIL, reason="Pillow present: the gate opens")
def test_gate_raises_without_pillow():
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(NotImplementedError, match="Pillow"):
        RealDecoder()


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow absent in this container")
def test_real_decode_matches_fake_schema():
    import io

    from PIL import Image

    def png(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (10, 20, 30)).save(buf, format="PNG")
        return buf.getvalue()

    payloads = [png(64, 48), png(320, 200)]
    batch = _bin_batch(payloads)
    real = RealDecoder()(batch)
    fake = FakeDecoder()(batch)
    # drop-in interchangeable: identical schema
    assert real.schema == fake.schema
    # real dims are the actual image dims
    assert real["fake_width"].to_pylist() == [64, 320]
    assert real["fake_height"].to_pylist() == [48, 200]
    # payload sha is decoder-independent
    assert real["bin_sha256"].to_pylist() == [
        hashlib.sha256(p).hexdigest() for p in payloads
    ]
    assert real["bin_sha256"].to_pylist() == fake["bin_sha256"].to_pylist()
    # decode_image agrees with the actor path
    assert decode_image(payloads[0]) == (64, 48)
