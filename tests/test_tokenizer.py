"""BPE tokenizer parity vs the reference CLIP tokenizer."""

import numpy as np
import pytest

from tests.reference_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

load_reference()

from vtp.tokenizers.text_tokenizer import SimpleTokenizer as RefTokenizer  # noqa: E402

from vtp_tpu.tokenizers import SimpleTokenizer  # noqa: E402

TEXTS = [
    "a photo of a dog.",
    "A PHOTO of a Dog!!!",
    "the quick brown fox jumps over 123 lazy dogs...",
    "",
    "  whitespace   everywhere  ",
    "naïve café — déjà vu; 東京 2024",
    "it's can't we're i'll you've they'd i'm",
    "a " * 200,  # truncation path: EOT forced at position 76
    "emoji 🐕 and symbols @#$%^&*()",
    "hyphen-ated words_and_underscores",
]


@pytest.fixture(scope="module")
def tokenizers():
    return RefTokenizer(), SimpleTokenizer()


def test_vocab_matches(tokenizers):
    ref, ours = tokenizers
    assert ours.vocab_size == ref.vocab_size == 49408
    assert ours.sot_token_id == ref.sot_token_id
    assert ours.eot_token_id == ref.eot_token_id
    assert ours.encoder == ref.encoder


def test_encode_matches(tokenizers):
    ref, ours = tokenizers
    for t in TEXTS:
        assert ours.encode(t) == ref.encode(t), t


def test_call_matches(tokenizers):
    ref, ours = tokenizers
    got = ours(TEXTS)
    want = ref(TEXTS).numpy()
    np.testing.assert_array_equal(got, want)
    assert got.shape == (len(TEXTS), 77)


def test_decode_roundtrip(tokenizers):
    _, ours = tokenizers
    ids = ours.encode("a photo of a dog")
    assert ours.decode(ids).strip() == "a photo of a dog"
