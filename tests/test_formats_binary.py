"""Round-trip tests for the MsgPack / Protobuf / RowBinary wire codecs
(formats_binary.py) — encode with our writer, read back through the
Spark binaryFile+mapInPandas path, and compare with the source rows.
Wire-level fixtures are hand-assembled from the published specs so the
decoder is checked against the format, not just against our encoder.
"""

import datetime
import struct

from daisy_spark import formats_binary as fb
from daisy_spark.sources import read_format


def test_msgpack_wire_decode_known_bytes():
    # hand-assembled per the msgpack spec: 1, -3, "ab", 3.5, nil,
    # [1, 2], {"k": 7}, bin8 0xDEAD, uint16 1000, true
    buf = (
        b"\x01"                      # fixint 1
        b"\xfd"                      # fixint -3
        b"\xa2ab"                    # fixstr "ab"
        b"\xcb" + struct.pack(">d", 3.5) +  # float64
        b"\xc0"                      # nil
        b"\x92\x01\x02"              # fixarray [1,2]
        b"\x81\xa1k\x07"             # fixmap {"k":7}
        b"\xc4\x02\xde\xad"          # bin8
        b"\xcd\x03\xe8"              # uint16 1000
        b"\xc3"                      # true
    )
    vals = list(fb.msgpack_decode_stream(buf))
    assert vals == [1, -3, "ab", 3.5, None, [1, 2], {"k": 7},
                    b"\xde\xad", 1000, True]


def test_msgpack_encode_decode_identity():
    vals = [0, 127, -1, -32, -33, 1 << 40, -(1 << 40), "x" * 40,
            b"\x00\xff" * 200, [1, [2, 3]], {"a": 1, "b": [True, None]},
            2.25, False]
    for v in vals:
        got = list(fb.msgpack_decode_stream(fb.msgpack_encode(v)))
        assert got == [v], v


def test_protobuf_wire_decode_known_bytes():
    # message { int64 id = 1; string name = 2; double score = 3;
    #           sint32 delta = 4; }  with id=150, name="hi",
    #           score=1.5, delta=-2 — tag bytes per the encoding guide
    msg = (
        b"\x08\x96\x01"              # field 1 varint 150
        b"\x12\x02hi"                # field 2 len-delim "hi"
        b"\x19" + struct.pack("<d", 1.5) +  # field 3 fixed64
        b"\x20\x03"                  # field 4 zigzag(-2)=3
    )
    fields = {1: ("id", "int64"), 2: ("name", "string"),
              3: ("score", "double"), 4: ("delta", "sint32")}
    row = fb._pb_decode_message(msg, fields)
    assert row == {"id": 150, "name": "hi", "score": 1.5, "delta": -2}
    # unknown fields are skipped, not fatal
    row2 = fb._pb_decode_message(msg, {1: ("id", "int64")})
    assert row2 == {"id": 150}


def test_msgpack_spark_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -0.25), (3, "gamma", 9.0)],
        "id long, name string, score double",
    ).repartition(2)
    out = str(tmp_path / "mp")
    fb.write_msgpack(df, out)
    back = read_format(spark, out, "MsgPack",
                       schema="id Int64, name String, score Float64")
    got = sorted((r.id, r.name, r.score) for r in back.collect())
    assert got == [(1, "alpha", 1.5), (2, "beta", -0.25), (3, "gamma", 9.0)]


def test_row_binary_spark_roundtrip(spark, tmp_path):
    rows = [
        (1, "x", 2.5, datetime.date(2024, 5, 17),
         datetime.datetime(2024, 5, 17, 12, 30, 0)),
        (2, "yy", -1.0, datetime.date(1970, 1, 2),
         datetime.datetime(2001, 9, 9, 1, 46, 40)),
    ]
    df = spark.createDataFrame(
        rows, "id long, s string, v double, d date, t timestamp"
    )
    sch = "id Int64, s String, v Float64, d Date, t DateTime"
    out = str(tmp_path / "rb")
    fb.write_row_binary(df, out, sch)
    back = read_format(spark, out, "RowBinary", schema=sch)
    got = sorted((r.id, r.s, r.v, r.d, r.t) for r in back.collect())
    assert got == sorted(rows)


def test_row_binary_nullable(spark, tmp_path):
    # Nullable(T): one flag byte per value — 0x01 alone means NULL (no
    # payload follows), 0x00 is followed by the value (reference
    # SerializationNullable::serializeBinary/deserializeBinary)
    payload = (
        b"\x00" + struct.pack("<q", 5) + b"\x00\x03abc"  # (5, "abc")
        + b"\x01" + b"\x00\x00"                          # (NULL, "")
        + b"\x01" + b"\x01"                              # (NULL, NULL)
    )
    p = tmp_path / "nb"
    p.mkdir()
    (p / "part-00000.bin").write_bytes(payload)
    back = read_format(
        spark, str(p), "RowBinary",
        schema="id Nullable(Int64), s Nullable(String)",
    )
    got = sorted(
        ((r.id, r.s) for r in back.collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1] is None, t[1] or ""),
    )
    assert got == [(5, "abc"), (None, ""), (None, None)]


def test_row_binary_nullable_roundtrip(spark, tmp_path):
    # writer emits the same flag-byte layout its reader consumes
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c")], "id long, s string"
    )
    sch = "id Nullable(Int64), s Nullable(String)"
    out = str(tmp_path / "rbn")
    fb.write_row_binary(df, out, sch)
    back = read_format(spark, out, "RowBinary", schema=sch)
    got = sorted(
        ((r.id, r.s) for r in back.collect()),
        key=lambda t: (t[0] is None, t[0] or 0),
    )
    assert got == [(1, "a"), (2, None), (None, "c")]


def test_protobuf_spark_roundtrip(spark, tmp_path):
    fields = {1: ("id", "int64"), 2: ("name", "string"),
              3: ("score", "double")}
    df = spark.createDataFrame(
        [(10, "a", 0.5), (20, "b", 1.5)], "id long, name string, score double"
    )
    out = str(tmp_path / "pb")
    fb.write_protobuf(df, out, fields)
    back = read_format(spark, out, "Protobuf",
                       options={"fields": fields})
    got = sorted((r.id, r.name, r.score) for r in back.collect())
    assert got == [(10, "a", 0.5), (20, "b", 1.5)]
