"""WARC container source (sources/warc.py): pure parser behavior,
the Spark binaryFile->mapInPandas reader, and the quarantine contract."""

from __future__ import annotations

import numpy as np
import pytest

from github_etl_spark.sources.warc import (
    build_warc_record,
    gzip_member,
    iter_warc_records,
    parse_http_response,
    read_warc,
)


def _rec(i, payload=b"hello world"):
    return build_warc_record(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:test:{i}>",
            "WARC-Target-URI": f"https://x.test/{i}",
        },
        payload,
    )


def test_roundtrip_plain_and_gzip_members():
    stream = _rec(0) + gzip_member(_rec(1)) + _rec(2) + gzip_member(_rec(3))
    got = list(iter_warc_records(stream))
    assert [f["warc-record-id"] for f, _, _ in got] == [
        f"<urn:test:{i}>" for i in range(4)
    ]
    assert [g for _, _, g in got] == [False, True, False, True]
    assert all(p == b"hello world" for _, p, _ in got)


def test_one_gzip_member_may_carry_several_records():
    stream = gzip_member(_rec(0) + _rec(1))
    got = list(iter_warc_records(stream))
    assert len(got) == 2 and all(g for _, _, g in got)


def test_payload_with_embedded_crlf_framing():
    # Content-Length framing must win over any bytes in the payload.
    tricky = b"WARC/1.0\r\n\r\n" + b"\r\n\r\n" * 3
    got = list(iter_warc_records(_rec(0, tricky)))
    assert got[0][1] == tricky


def test_writer_rejects_header_injection():
    with pytest.raises(ValueError, match="CR/LF"):
        build_warc_record({"WARC-Type": "a\r\nX: y"}, b"")
    with pytest.raises(ValueError, match="derived"):
        build_warc_record({"Content-Length": "4"}, b"")


def test_gzip_member_is_deterministic():
    assert gzip_member(_rec(7)) == gzip_member(_rec(7))


def test_http_response_parse():
    status, hdrs, body = parse_http_response(
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\nnope"
    )
    assert status == 404
    assert hdrs["content-type"] == "text/plain"
    assert body == b"nope"
    with pytest.raises(ValueError):
        parse_http_response(b"not http at all")


def test_parser_valueerror_only_fuzz():
    """Truncations and corruptions of a valid mixed stream must decode
    or raise ValueError — never zlib.error/KeyError/IndexError/
    UnicodeDecodeError-as-other (the quarantine contract)."""
    good = _rec(0) + gzip_member(_rec(1)) + _rec(2)
    rng = np.random.RandomState(7)
    for trial in range(400):
        if trial % 2 == 0:
            b = good[: rng.randint(0, len(good))]
        else:
            ba = bytearray(good)
            for _ in range(rng.randint(1, 4)):
                ba[rng.randint(0, len(ba))] = rng.randint(0, 256)
            b = bytes(ba)
        try:
            list(iter_warc_records(b))
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001 — assertion target
            raise AssertionError(
                f"trial {trial}: leaked {type(e).__name__}: {e}"
            ) from e


def test_read_warc_provenance_and_gzip_flags(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(_rec(0) + _rec(1))
    (d / "b.warc.gz").write_bytes(gzip_member(_rec(2)) + gzip_member(_rec(3)))
    records, quarantine = read_warc(spark, str(d))
    rows = records.orderBy("target_uri").collect()
    assert [r["target_uri"] for r in rows] == [
        f"https://x.test/{i}" for i in range(4)
    ]
    assert [r["is_gzip"] for r in rows] == [False, False, True, True]
    assert all(r["source_file"].endswith(("a.warc", "b.warc.gz")) for r in rows)
    assert [r["record_index"] for r in rows] == [0, 1, 0, 1]
    assert bytes(rows[0]["payload"]) == b"hello world"
    assert quarantine.count() == 0


def test_read_warc_quarantines_file_tail_after_bad_record(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    # one good record, then garbage, then a record that must NOT be
    # trusted (no resync after a framing error)
    (d / "bad.warc").write_bytes(_rec(0) + b"GARBAGE NOT A RECORD" + _rec(1))
    (d / "good.warc").write_bytes(_rec(9))
    records, quarantine = read_warc(spark, str(d))
    recs = records.collect()
    assert sorted(r["target_uri"] for r in recs) == [
        "https://x.test/0",
        "https://x.test/9",
    ]
    q = quarantine.collect()
    assert len(q) == 1
    assert q[0]["source_file"].endswith("bad.warc")
    assert q[0]["record_index"] == 1
    assert "WARC" in q[0]["error"] or "header" in q[0]["error"]


def test_read_warc_truncated_gzip_quarantined(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "t.warc.gz").write_bytes(gzip_member(_rec(0))[:-5])
    records, quarantine = read_warc(spark, str(d))
    assert records.count() == 0
    q = quarantine.collect()
    assert len(q) == 1 and "gzip" in q[0]["error"]


def test_read_warc_empty_file(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "e.warc").write_bytes(b"")
    records, quarantine = read_warc(spark, str(d))
    assert records.count() == 0 and quarantine.count() == 0


def test_gzip_bomb_member_quarantined_as_valueerror(monkeypatch):
    """A member expanding past MAX_MEMBER_PLAINTEXT must raise
    ValueError (quarantine), never buffer the full plaintext /
    MemoryError.  Cap patched small so the test stays cheap; the
    just-at-cap sibling below proves the boundary is exclusive."""
    import github_etl_spark.sources.warc as warc_mod

    monkeypatch.setattr(warc_mod, "MAX_MEMBER_PLAINTEXT", 1 << 12)
    bomb = gzip_member(_rec(0, payload=b"\x00" * (1 << 14)))
    with pytest.raises(ValueError, match="decompressed size cap"):
        list(iter_warc_records(bomb))


def test_gzip_member_exactly_at_cap_still_decodes(monkeypatch):
    import github_etl_spark.sources.warc as warc_mod

    rec = _rec(0, payload=b"x" * 1000)
    monkeypatch.setattr(warc_mod, "MAX_MEMBER_PLAINTEXT", len(rec))
    out = list(iter_warc_records(gzip_member(rec)))
    assert len(out) == 1 and out[0][1] == b"x" * 1000
    monkeypatch.setattr(warc_mod, "MAX_MEMBER_PLAINTEXT", len(rec) - 1)
    with pytest.raises(ValueError, match="decompressed size cap"):
        list(iter_warc_records(gzip_member(rec)))
