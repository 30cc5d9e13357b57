from ao_tpu.eval.perplexity import perplexity, ppl_delta_report, synthetic_tokens

__all__ = ["perplexity", "ppl_delta_report", "synthetic_tokens"]
