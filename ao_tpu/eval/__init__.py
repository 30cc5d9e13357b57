from ao_tpu.eval.perplexity import load_tokens, perplexity, ppl_delta_report, synthetic_tokens

__all__ = ["load_tokens", "perplexity", "ppl_delta_report", "synthetic_tokens"]
