from __future__ import annotations

from appstore_aws_etl_spark.llm.multimodal import extract_features, read_media_dir


def test_binary_file_source_roundtrip(spark, tmp_path):
    payloads = {f"img_{i}.bin": bytes([i]) * (100 + i) for i in range(5)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    (tmp_path / "ignore.txt").write_text("not media")

    media = read_media_dir(spark, str(tmp_path), pattern="*.bin")
    rows = media.collect()
    assert len(rows) == 5
    got = {r["path"].rsplit("/", 1)[-1]: bytes(r["payload"]) for r in rows}
    assert got == payloads
    for r in rows:
        assert r["n_bytes"] == len(got[r["path"].rsplit("/", 1)[-1]])

    feats = extract_features(
        media.selectExpr("abs(hash(path)) as media_id", "payload")
    ).collect()
    assert len(feats) == 5
    assert all(len(r["feature"]) == 8 for r in feats)


def test_fake_resize_multibyte_and_ratio():
    from appstore_aws_etl_spark.llm.multimodal import fake_resize

    payload = "héllo wörld".encode()
    half = fake_resize(payload)  # 11 chars -> keep 6: "héllo "
    assert half.decode() == "héllo "
    assert fake_resize(payload, 1, 1) == payload  # identity scale
    assert fake_resize(b"", 1, 2) == b""          # empty payload
    # non-utf8 bytes survive the surrogateescape round trip
    raw = bytes([0xFF, 0x41, 0x42, 0x43])
    assert fake_resize(raw, 1, 1) == raw


def test_netpbm_decode_roundtrip_and_header_variants():
    import numpy as np
    import pytest

    from appstore_aws_etl_spark.llm.multimodal import decode_image, encode_netpbm

    gray = (np.arange(12, dtype=np.uint8) * 7).reshape(3, 4)
    assert np.array_equal(decode_image(encode_netpbm(gray)), gray)
    rgb = (np.arange(24, dtype=np.uint8) * 5).reshape(2, 4, 3)
    assert np.array_equal(decode_image(encode_netpbm(rgb)), rgb)

    # comments + arbitrary whitespace in the header (P5), ascii P2/P3
    p5 = b"P5 # comment\n# another\n 4\t3 # w h\n255\n" + bytes(gray.tobytes())
    assert np.array_equal(decode_image(p5), gray)
    p2 = b"P2\n4 3\n255\n" + " ".join(str(v) for v in gray.ravel()).encode()
    assert np.array_equal(decode_image(p2), gray)
    p3 = b"P3\n4 2\n255\n" + " ".join(str(v) for v in rgb.ravel()).encode()
    assert np.array_equal(decode_image(p3), rgb)

    # raster bytes that look like header chars must not confuse the parse
    tricky = np.full((2, 2), ord("#"), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_netpbm(tricky)), tricky)

    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"P5\n4 3\n255\n" + b"\x00" * 11)  # one byte short
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"P2\n4 3\n255\n1 2 3")
    with pytest.raises(ValueError, match="unsupported"):
        decode_image(b"\x89PNG\r\n")
    with pytest.raises(ValueError, match="16-bit"):
        decode_image(b"P5\n2 2\n65535\n" + b"\x00" * 8)
    # ASCII samples above maxval must raise, never wrap via uint8 cast
    with pytest.raises(ValueError, match="outside"):
        decode_image(b"P2\n2 2\n255\n1 2 3 300")
    with pytest.raises(ValueError, match="outside"):
        decode_image(b"P2\n2 2\n100\n1 2 3 101")  # within 255, over maxval
    with pytest.raises(ValueError, match="outside"):
        decode_image(b"P3\n1 1\n255\n-1 0 0")


def test_decode_pixel_stats_matches_numpy(spark):
    import numpy as np

    from appstore_aws_etl_spark.llm.multimodal import (
        decode_pixel_stats,
        gradient_image,
        decode_image,
    )

    ids = spark.createDataFrame([(i,) for i in (0, 1, 2, 7, 100, 101)], "media_id long")
    got = {r["media_id"]: r for r in decode_pixel_stats(ids).collect()}
    assert len(got) == 6
    for mid in (0, 1, 2, 7, 100, 101):
        px = decode_image(gradient_image(mid))
        flat = np.asarray(px, dtype=np.int64).ravel()
        r = got[mid]
        # odd ids are RGB (3 values/pixel), even grayscale
        assert r["n_values"] == 16 * (4 + mid % 8) * (1 if mid % 2 == 0 else 3)
        assert (r["px_sum"], r["px_min"], r["px_max"]) == (
            int(flat.sum()), int(flat.min()), int(flat.max())
        )
        assert abs(r["px_mean"] - flat.mean()) < 1e-6
