"""Round 13 (verdict ask #5b): close the shared encoder-decoder loop on
ISO 32000-2 algorithm 2.B.

``hash_2b`` is consumed by BOTH halves of the std_* discipline (the
fixture encoder computes /U //UE with the same function the decryptor
verifies), so a transcription error would be self-consistent and
invisible to the roundtrip tests.  This module re-derives 2.B from the
spec text a SECOND time with a deliberately different structure (the
mupdf-style top-tested loop over completed-iteration counts, separate
hash dispatch table, no early-return) and cross-checks the two on a
spread of password/salt/udata inputs.

Honesty note: this is an independent RESTATEMENT, not an external
known-answer vector — the container has no network access to fetch
third-party R6 fixtures, and the ISO test data is not redistributable.
It catches transcription errors (wrong slice, wrong hash pick, wrong
repetition count, off-by-one termination) but not a shared misreading
of the spec; the AES core underneath is externally anchored by the
committed FIPS-197 C.1/C.3 known-answer vectors.
"""

from __future__ import annotations

import hashlib

import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.pdf import (
    _aes_cbc_nopad,
    hash_2b,
)

_HASHES = {0: hashlib.sha256, 1: hashlib.sha384, 2: hashlib.sha512}


def _hash_2b_restated(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2, 7.6.4.3.4 algorithm 2.B, restated top-tested:

    K0 = SHA-256(pw || salt || udata); for each completed round i
    (starting at 0): K1 = (pw || K || udata) x 64; E = AES-128-CBC
    encrypt of K1 with key K[0:16] and IV K[16:32]; K = SHA-{256,384,
    512}(E) picked by sum(E[0:16]) mod 3.  The loop continues while
    fewer than 64 rounds completed OR the last byte of E exceeds
    (completed rounds) - 32; the result is the first 32 bytes of K."""
    k = hashlib.sha256(pw + salt + udata).digest()
    e = b"\xff"  # forces the first iteration
    i = 0
    while i < 64 or e[-1] > i - 32:
        k1 = (pw + k + udata) * 64
        e = _aes_cbc_nopad(k[:16], k1, k[16:32], encrypt=True)
        k = _HASHES[sum(e[:16]) % 3](e).digest()
        i += 1
    return k[:32]


@pytest.mark.parametrize(
    "pw,salt,udata",
    [
        (b"", b"VALSALT0", b""),
        (b"", b"KEYSALT0", b""),
        (b"user", b"\x00" * 8, b""),
        (b"owner-secret", b"\xff\xfe\xfd\xfc\xfb\xfa\xf9\xf8", b"x" * 48),
        (b"\xe4\xb8\xad\xe6\x96\x87", b"01234567", b""),  # UTF-8 password
        (b"p" * 127, b"SALTSALT", b"u" * 48),
    ],
)
def test_hash_2b_matches_independent_restatement(pw, salt, udata):
    assert hash_2b(pw, salt, udata) == _hash_2b_restated(pw, salt, udata)


def test_restatement_actually_iterates_past_64():
    """Sanity: for at least one input the data-dependent tail runs
    PAST 64 rounds (E[-1] > i-32 at round 64), otherwise the
    termination clause was never exercised by the cross-check."""
    ran_long = False
    for n in range(16):
        salt = bytes([n]) * 8
        k = hashlib.sha256(b"" + salt).digest()
        e = b"\xff"
        i = 0
        while i < 64 or e[-1] > i - 32:
            k1 = (b"" + k) * 64
            e = _aes_cbc_nopad(k[:16], k1, k[16:32], encrypt=True)
            k = _HASHES[sum(e[:16]) % 3](e).digest()
            i += 1
        if i > 64:
            ran_long = True
            assert hash_2b(b"", salt) == k[:32]
            break
    assert ran_long, "no sampled salt exercised the >64-round tail"
