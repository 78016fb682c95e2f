"""Dataset-level inference loop (reference ``evaluation/evaluator.py:84``
``inference_on_dataset``): run a predictor over a loader, feed an evaluator,
report timing (warmup-excluded, like the reference's 5-image warmup)."""

from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Iterable, Optional

logger = logging.getLogger(__name__)


def inference_on_dataset(
    predictor,
    loader: Iterable[Dict],
    evaluator,
    warmup: int = 1,
) -> Dict:
    """predictor: object with predict_batch(batch) -> list of per-image dicts
    with boxes/scores/classes/image_id. evaluator: FLIREvaluator-style
    (reset/process/evaluate)."""
    evaluator.reset()
    total_images = 0
    total_time = 0.0
    n_batches = 0
    for batch in loader:
        start = time.perf_counter()
        results = predictor.predict_batch(batch)
        elapsed = time.perf_counter() - start
        n_batches += 1
        if n_batches > warmup:
            total_time += elapsed
            total_images += len(results)
        for rec in results:
            evaluator.process(
                rec["image_id"], rec["boxes"], rec["scores"], rec["classes"]
            )
    if total_images:
        logger.info(
            "inference: %.4f s/img (%.1f img/s) over %d images",
            total_time / total_images,
            total_images / total_time if total_time else float("inf"),
            total_images,
        )
    results = evaluator.evaluate()
    return results
