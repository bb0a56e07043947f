"""Email/mbox parsing (operators/emailmsg.py)."""

import pytest

from geist_spark.operators.emailmsg import _parse_one, _split_mbox, email_parse

MSG = (
    b"From: Alice <alice@example.com>\r\n"
    b"To: Bob <bob@example.com>, Carol <c@example.com>\r\n"
    b"Subject: =?utf-8?B?SMOpbGxvIHdvcmxk?=\r\n"
    b"Date: Fri, 02 Jan 2026 03:04:05 +0000\r\n"
    b"MIME-Version: 1.0\r\n"
    b"Content-Type: multipart/mixed; boundary=XYZ\r\n\r\n"
    b"--XYZ\r\nContent-Type: text/plain; charset=utf-8\r\n\r\n"
    b"Body line one.\r\n"
    b"--XYZ\r\nContent-Type: text/html\r\n\r\n<p>html</p>\r\n"
    b"--XYZ\r\nContent-Type: application/pdf\r\n"
    b'Content-Disposition: attachment; filename="r.pdf"\r\n\r\nPDF\r\n'
    b"--XYZ--\r\n"
)


def test_message_surface():
    info = _parse_one(MSG)
    assert info["subject"] == "Héllo world"  # RFC 2047 decoded
    assert info["date_iso"] == "2026-01-02T03:04:05+00:00"
    assert info["n_parts"] == 3 and info["n_attachments"] == 1
    assert info["attachment_names"] == "r.pdf"
    assert info["has_html"] and info["body_text"] == "Body line one."


def test_mbox_split():
    mbox = (
        b"From a@x Mon Jan  1 00:00:00 2026\n"
        b"From: c@e\nSubject: first\n\nbody one\n\n"
        b"From b@x Mon Jan  1 00:00:01 2026\n"
        b"From: d@e\nSubject: second\n\nbody two\n"
    )
    msgs = _split_mbox(mbox)
    assert len(msgs) == 2
    assert _parse_one(msgs[0])["subject"] == "first"
    assert _parse_one(msgs[1])["body_text"] == "body two\n"


def test_spark_surface_and_tiers(spark):
    rows = email_parse(
        spark.createDataFrame(
            [(1, MSG), (2, None)], "file_id long, payload binary"
        )
    ).collect()
    assert len(rows) == 1 and rows[0]["subject"] == "Héllo world"
    bad = spark.createDataFrame(
        [(9, b"\x00\x01not a message")], "file_id long, payload binary"
    )
    with pytest.raises(Exception, match="neither an"):
        email_parse(bad).collect()
    # on_unsupported='null' skips the foreign payload
    assert email_parse(bad, on_unsupported="null").count() == 0
