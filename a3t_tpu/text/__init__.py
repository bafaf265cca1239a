from a3t_tpu.text.tokenizer import TokenIDConverter, build_token_list, tokenize

__all__ = ["TokenIDConverter", "build_token_list", "tokenize"]
