from ao_tpu.eval.cloze import cloze_accuracy
from ao_tpu.eval.corpus import load_byte_corpus, train_eval_split
from ao_tpu.eval.perplexity import load_tokens, perplexity, ppl_delta_report, synthetic_tokens

__all__ = [
    "cloze_accuracy",
    "load_byte_corpus",
    "load_tokens",
    "perplexity",
    "ppl_delta_report",
    "synthetic_tokens",
    "train_eval_split",
]
