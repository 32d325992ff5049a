from osr_tpu.readers.registry import ReaderRegistry
from osr_tpu.readers.extractive import ExtractiveReader
from osr_tpu.readers.generative import GenerativeReader
from osr_tpu.readers.llm import LLMReader

__all__ = ["ReaderRegistry", "ExtractiveReader", "GenerativeReader", "LLMReader"]
