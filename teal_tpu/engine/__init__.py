from teal_tpu.engine.generate import Generator, GenerateStats

__all__ = ["Generator", "GenerateStats"]
