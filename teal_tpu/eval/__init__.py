from teal_tpu.eval.ppl import eval_ppl

__all__ = ["eval_ppl"]
