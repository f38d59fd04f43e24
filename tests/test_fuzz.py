"""Property/fuzz tests (hypothesis) — the analog of the reference's
libFuzzer harnesses (tests/fuzzing/):

* block-format differential fuzz: arbitrary inputs round-trip through our
  encoder and cross-decode with the oracle (fuzz_block_format.nim:8-33);
* framed idempotence fuzz: decode(encode(decode(x))) stability
  (fuzz_framing_format.nim:4-14);
* decoder fuzz: arbitrary byte strings are either rejected identically by
  kernel and oracle or decode to identical bytes.
"""

import os

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

import snappy_tpu as s  # noqa: E402
from snappy_tpu.formats import varint  # noqa: E402
from snappy_tpu.testing import oracle  # noqa: E402

from test_kernels import jax_decode_tagstream  # noqa: E402

# Env-scaled budget: the reference fuzzes open-endedly under libFuzzer;
# CI keeps the default small, `SNAPPY_TPU_FUZZ_EXAMPLES=3000 pytest` runs a
# long fuzz session.
_SETTINGS = dict(
    max_examples=int(os.environ.get("SNAPPY_TPU_FUZZ_EXAMPLES", "30")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

payloads = st.one_of(
    st.binary(min_size=0, max_size=4096),
    # Highly repetitive payloads exercise the copy paths.
    st.tuples(st.binary(min_size=1, max_size=24), st.integers(1, 400)).map(
        lambda t: (t[0] * t[1])[:8000]
    ),
)


class TestRoundtripFuzz:
    @given(payloads)
    @settings(**_SETTINGS)
    def test_encode_decode_roundtrip(self, payload):
        enc = s.encode(payload)
        assert s.decode(enc) == payload
        dec, err = oracle.uncompress(enc)
        assert err is None and dec == payload

    @given(payloads)
    @settings(**_SETTINGS)
    def test_framed_roundtrip(self, payload):
        enc = s.encode_framed(payload)
        assert s.decode_framed(enc) == payload

    @given(payloads)
    @settings(**_SETTINGS)
    def test_framed_idempotence(self, payload):
        # decode(encode(x)) == decode(encode(decode(encode(x))))
        once = s.decode_framed(s.encode_framed(payload))
        twice = s.decode_framed(s.encode_framed(once))
        assert once == twice == payload


class TestDecoderFuzz:
    @given(st.binary(min_size=0, max_size=300))
    @settings(**_SETTINGS)
    def test_arbitrary_input_differential(self, data):
        """Kernel and oracle must agree on accept/reject AND on the bytes."""
        ref, ref_err = oracle.uncompress(data)
        got = s.decode(data)
        if ref_err is None:
            assert got == ref
        else:
            assert got == b""

    @given(st.binary(min_size=1, max_size=200), st.integers(0, 400))
    @settings(**_SETTINGS)
    def test_tagstream_differential(self, body, declared):
        ref_out, ref_err = oracle.decode_all_tags(body, declared)
        ref_ok = ref_err is None and len(ref_out) == declared
        out, ok, _ = jax_decode_tagstream(body, declared)
        assert ok == ref_ok
        if ok:
            assert out == bytes(ref_out)
