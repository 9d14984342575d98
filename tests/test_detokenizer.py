import numpy as np
import pytest


@pytest.fixture(scope="module")
def bpe_tokenizer(tmp_path_factory):
    from transformers import AutoTokenizer

    from mlx_vlm_tpu.utils.testing import build_tiny_checkpoint

    d = tmp_path_factory.mktemp("tok")
    build_tiny_checkpoint(str(d))
    return AutoTokenizer.from_pretrained(str(d))


class TestBPEStreaming:
    def test_selected_for_bytelevel(self, bpe_tokenizer):
        from mlx_vlm_tpu.utils.tokenizer import (
            BPEStreamingDetokenizer,
            make_detokenizer,
        )

        detok = make_detokenizer(bpe_tokenizer)
        assert isinstance(detok, BPEStreamingDetokenizer)

    def test_stream_matches_full_decode(self, bpe_tokenizer):
        from mlx_vlm_tpu.utils.tokenizer import make_detokenizer

        text = "What is in this image? A photo of a cat, thank you. " * 3
        ids = bpe_tokenizer.encode(text)
        detok = make_detokenizer(bpe_tokenizer)
        out = []
        for t in ids:
            detok.add_token(t)
            out.append(detok.last_segment())
        out.append(detok.finalize())
        assert "".join(out) == bpe_tokenizer.decode(ids)

    def test_multibyte_utf8_held_back(self, bpe_tokenizer):
        """Partial UTF-8 sequences must not emit replacement chars."""
        from mlx_vlm_tpu.utils.tokenizer import BPEStreamingDetokenizer

        detok = BPEStreamingDetokenizer(bpe_tokenizer)
        # encode a multi-byte char; feed tokens one at a time
        ids = bpe_tokenizer.encode("café ☕ done")
        pieces = []
        for t in ids:
            detok.add_token(t)
            seg = detok.last_segment()
            assert "�" not in seg
            pieces.append(seg)
        pieces.append(detok.finalize())
        assert "".join(pieces) == bpe_tokenizer.decode(ids)


class TestSPM:
    def test_spm_pieces(self):
        from mlx_vlm_tpu.utils.tokenizer import SPMStreamingDetokenizer

        class FakeSPM:
            pieces = {1: "▁Hello", 2: "▁wor", 3: "ld", 4: "<0xE2>",
                      5: "<0x98>", 6: "<0x95>"}

            def convert_ids_to_tokens(self, i):
                return self.pieces[i]

        d = SPMStreamingDetokenizer(FakeSPM())
        out = []
        for t in [1, 2, 3, 4, 5, 6]:
            d.add_token(t)
            out.append(d.last_segment())
        out.append(d.finalize())
        assert "".join(out) == "Hello world☕"
