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
