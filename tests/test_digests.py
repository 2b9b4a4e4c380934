"""CRC16 / Base64 / HexDump parity (SURVEY P16; reference
util/shared/{CRC16,Base64,HexDump}.java)."""

from commoncrawl_ray.functions.digests import (
    ORDERED,
    URL_SAFE,
    b64_decode,
    b64_encode,
    crc16,
    dump_hex_string,
    hex_string_to_bytes,
    to_hex_string,
    _CRC16_TABLE,
)


def test_crc16_table_matches_reference():
    # leading entries of CRC16.java:22-50's table — proves the generated
    # table equals the transcribed one
    assert _CRC16_TABLE[:8] == [0x0000, 0xC0C1, 0xC181, 0x0140, 0xC301, 0x03C0, 0x0280, 0xC241]
    assert _CRC16_TABLE[255] == 0x4040


def test_crc16_check_vector():
    # standard CRC-16/ARC check value
    assert crc16(b"123456789") == 0xBB3D
    assert crc16(b"") == 0


def test_base64_variants_roundtrip():
    data = bytes(range(0, 256, 7)) + b"\xff\xfe"
    for opts in (0, URL_SAFE, ORDERED):
        enc = b64_encode(data, opts)
        assert b64_decode(enc, opts) == data
    # ordered alphabet is URL/file safe and sorts like the bytes
    assert "+" not in b64_encode(data, ORDERED) and "/" not in b64_encode(data, ORDERED)
    assert b64_encode(b"\xfb\xef\xbe", ORDERED) != b64_encode(b"\xfb\xef\xbe")


def test_hexdump_format():
    assert to_hex_string(b"\x00\xab\x7f") == "00AB7F"
    assert to_hex_string(0x1234) == "00001234"
    assert hex_string_to_bytes("00ab7F") == b"\x00\xab\x7f"
    dump = dump_hex_string(b"Hello\x00World!ABCDEF0123")
    lines = dump.split("\n")
    assert lines[1].startswith("0x00000000 48 65 6C 6C 6F 00 57 6F 72 6C 64 21 41 42 43 44")
    assert lines[1].endswith("Hello.World!ABCD")
    assert lines[2].startswith("0x00000010 45 46 30 31 32 33")
    assert lines[2].endswith("EF0123")
    # space gutter excludes 0x20 itself (exclusive > ' ')
    assert dump_hex_string(b" ~").endswith("..")
