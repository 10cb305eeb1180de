from vtp_tpu.tokenizers.bpe import SimpleTokenizer, get_tokenizer

__all__ = ["SimpleTokenizer", "get_tokenizer"]
