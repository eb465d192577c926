from ocr_ray.stages.normalize import normalize_batch
from ocr_ray.stages.extract import Extractor
from ocr_ray.stages.cleanup import make_clean_batch
from ocr_ray.stages.reassemble import assemble_conversations

__all__ = ["normalize_batch", "Extractor", "make_clean_batch", "assemble_conversations"]
