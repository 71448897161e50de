from qserve_tpu.eval.ppl import evaluate_ppl, tokenize_text  # noqa: F401
