from ocr_ray.pipelines.extract import (
    build_turn_pipeline,
    run_extraction_job,
)

__all__ = ["build_turn_pipeline", "run_extraction_job"]
