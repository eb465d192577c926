from ocr_ray.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
    make_conv,
)

__all__ = ["TRANSCRIPT_SCHEMA", "generate_transcripts", "make_conv"]
