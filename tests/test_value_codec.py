"""Codec + ordering tests, mirroring the reference's
`data/tests/{memcmp,values}.rs` strategy: round-trips and order parity."""

import math
import random
import uuid

import numpy as np
import pytest

from cozo_tpu.data.memcmp import decode_tuple, decode_value, encode_tuple, encode_value
from cozo_tpu.data.value import (
    BOT,
    DSet,
    Json,
    Regex,
    Uuid,
    Validity,
    Vector,
    cmp_key,
    to_json,
)


SAMPLES = [
    None,
    False,
    True,
    0,
    1,
    -1,
    42,
    -(1 << 62),
    (1 << 62),
    (1 << 53) + 1,
    1.5,
    -3.25,
    0.0,
    -0.0,
    float("inf"),
    float("-inf"),
    float("nan"),
    "",
    "hello",
    "héllo wörld",
    "a\x00b",
    b"",
    b"\x00\x01\xff",
    Uuid(uuid.UUID("f1b2c3d4-aaaa-bbbb-cccc-deadbeef0001")),
    [],
    [1, "two", [3.0, None]],
    ["a", b"b"],
    DSet([3, 1, 2, 1]),
    Vector(np.array([1.0, -2.5, 3e9], dtype=np.float32)),
    Vector(np.array([1.0, -2.5], dtype=np.float64)),
    Json({"a": [1, 2], "b": {"c": None}}),
    Validity(12345, True),
    Validity(12345, False),
    Validity(-7, True),
    BOT,
]


def roundtrip(v):
    buf = bytearray()
    encode_value(buf, v)
    out, pos = decode_value(bytes(buf), 0)
    assert pos == len(buf)
    return out


@pytest.mark.parametrize("v", SAMPLES, ids=lambda v: repr(v)[:40])
def test_roundtrip(v):
    out = roundtrip(v)
    if isinstance(v, float) and math.isnan(v):
        assert isinstance(out, float) and math.isnan(out)
    else:
        assert cmp_key(out) == cmp_key(v)


def test_tuple_roundtrip():
    tup = [1, "a", [True, None], 2.5]
    data = encode_tuple(tup)
    assert decode_tuple(data) == tup


def test_int_float_distinct_but_interleaved():
    k1, k15, k2 = cmp_key(1), cmp_key(1.5), cmp_key(2)
    assert k1 < k15 < k2
    assert cmp_key(1) != cmp_key(1.0)
    assert cmp_key(1) < cmp_key(1.0)  # int first on ties (value.rs:576-598)
    assert cmp_key(True) != cmp_key(1)


def test_validity_descending():
    # newer timestamps sort FIRST (Reverse semantics, value.rs:112-137)
    assert cmp_key(Validity(10, True)) < cmp_key(Validity(5, True))
    assert cmp_key(Validity(10, True)) < cmp_key(Validity(10, False))


def test_storage_order_consistency():
    """Encoded byte order must be a total order consistent within each type
    group, and int/float must interleave numerically."""
    nums = [0, 1, -1, 2.5, -2.5, 100, -100, 3.0, (1 << 53), float("inf"), float("-inf")]
    enc = []
    for v in nums:
        buf = bytearray()
        encode_value(buf, v)
        enc.append((bytes(buf), v))
    enc.sort()
    dec = [v for _, v in enc]
    as_floats = [float(v) for v in dec]
    assert as_floats == sorted(as_floats)


def test_string_prefix_order():
    def enc(v):
        buf = bytearray()
        encode_value(buf, v)
        return bytes(buf)

    assert enc("a") < enc("a\x00") < enc("a\x00b") < enc("ab")
    assert enc(["a"]) < enc(["a", "b"]) < enc(["ab"])


def test_random_num_order_parity():
    rng = random.Random(7)
    vals = []
    for _ in range(300):
        if rng.random() < 0.5:
            vals.append(rng.randint(-(1 << 60), 1 << 60))
        else:
            vals.append(rng.uniform(-1e18, 1e18))
    by_cmp = sorted(vals, key=cmp_key)

    def enc(v):
        buf = bytearray()
        encode_value(buf, v)
        return bytes(buf)

    by_bytes = sorted(vals, key=enc)
    assert [cmp_key(v) for v in by_cmp] == [cmp_key(v) for v in by_bytes]


def test_to_json():
    assert to_json(float("nan")) is None
    assert to_json(float("inf")) == "INFINITY"
    assert to_json(b"\x01\x02") == "AQI="
    assert to_json(Vector(np.array([1, 2], dtype=np.float32))) == [1.0, 2.0]
    assert to_json(Validity(5, True)) == [5, True]
    assert to_json(Json({"x": 1})) == {"x": 1}


def test_c_codec_parity_fuzz():
    """The C scalar codec (native/codec.c) must agree byte-for-byte with
    the pure-Python encoder and round-trip identically, including the
    fallback on complex types and out-of-range ints."""
    import math
    import random
    import uuid as _uuid

    import pytest

    from cozo_tpu.data import memcmp as M
    from cozo_tpu.data.value import Uuid, Validity

    if M._ccodec is None:
        pytest.skip("C codec unavailable")
    random.seed(7)
    vals = [None, True, False, 0, 1, -1, 2**62, -(2**62), 2**63 - 1,
            -(2**63), 0.0, -0.0, 1.5, -1.5, float("inf"), float("-inf"),
            math.pi, "", "a", "héllo", "with\x00zero", b"", b"x",
            b"\x00\x01\x00", "長い日本語テキスト"]
    for _ in range(2000):
        tup = [random.choice(vals) for _ in range(random.randrange(0, 5))]
        c = M.encode_tuple(tup)
        assert c == M._py_encode_tuple(tup), tup
        assert repr(M.decode_tuple(c)) == repr(list(tup))
    # complex values take the fallback and still match
    tup = [1, Uuid(_uuid.uuid4()), Validity(5, True), ["nested", 2]]
    assert M.encode_tuple(tup) == M._py_encode_tuple(tup)
    assert repr(M.decode_tuple(M.encode_tuple(tup))) == repr(
        M._py_decode_tuple(M._py_encode_tuple(tup))
    )
    # NaN encodes identically and round-trips as NaN
    c = M.encode_tuple([float("nan")])
    assert c == M._py_encode_tuple([float("nan")])
    assert math.isnan(M.decode_tuple(c)[0])
    # ints beyond i64 raise the canonical error via the Python fallback
    with pytest.raises(Exception):
        M.encode_tuple([10**30])
