"""Top-image selection + thumbnail math (O4 in SURVEY.md §2.6).

The reference fetches every candidate image over the network, reads its
dimensions, and picks the largest by the ``calculate_area`` score
(image_extractor.py:199-224); the thumbnail path entropy-crops to a
square and shrinks to 90x90 (image_extractor.py:45-77). There is no
network here, so the *scoring and cropping algebra* is implemented as
pure functions over (url, width, height) rows and histogram/pixel
arrays — dims come from the multimodal decode stage
(pipelines/multimodal.py) or a metadata sidecar at scale. Constants and
gate order mirror the reference exactly:

- ``minimal_area`` 5000, ``thumbnail_size`` (90, 90)
  (image_extractor.py:27-29)
- gates in calculate_area order: no dims -> 0; area < 5000 -> 0;
  width < 90 -> 0; max/min ratio > config.image_dimension_ration
  (16/9, configuration.py:49) -> 0; 'sprite' or 'logo' in url ->
  area/10 (image_extractor.py:199-224)
- ``image_entropy`` = Shannon entropy of the histogram
  (image_extractor.py:51-57); ``square_image`` slices <=10 px strips
  off the lower-entropy end until square (image_extractor.py:60-77).
"""

from __future__ import annotations

import math

MINIMAL_AREA = 5000             # image_extractor.py:29
THUMBNAIL_SIZE = (90, 90)       # image_extractor.py:28
DIMENSION_RATIO = 16 / 9.0      # configuration.py:49
SPRITE_PENALTY = 10.0           # image_extractor.py:221


def _is_sprite_or_logo(url: str) -> bool:
    low = (url or "").lower()
    return "sprite" in low or "logo" in low


def calculate_area(img_url: str, dimension: tuple[int, int] | None) -> float:
    """image_extractor.py:199-224 verbatim algebra (network fetch of the
    dimension replaced by the caller-supplied tuple)."""
    if not dimension:
        return 0.0
    area = float(dimension[0] * dimension[1])
    if area < MINIMAL_AREA:
        return 0.0
    if dimension[0] < THUMBNAIL_SIZE[0]:
        return 0.0
    current_ratio = max(dimension) / min(dimension)
    if current_ratio > DIMENSION_RATIO:
        return 0.0
    if _is_sprite_or_logo(img_url):
        area /= SPRITE_PENALTY
    return area


def score_image(url: str, width: int, height: int) -> float:
    """Back-compat wrapper over calculate_area."""
    if not url or width <= 0 or height <= 0:
        return 0.0
    return calculate_area(url, (width, height))


def select_top_image(candidates: list[tuple[str, int, int]],
                     top_img: str | None = None) -> str:
    """largest_image_url (image_extractor.py:183-198): an existing
    top_img short-circuits; otherwise the strict maximum of
    calculate_area in page order (first max wins on ties)."""
    if top_img:
        return top_img
    best_url, best_score = "", 0.0
    for url, w, h in candidates:
        s = score_image(url, w, h)
        if s > best_score:
            best_url, best_score = url, s
    return best_url


def satisfies_requirements(url: str, width: int, height: int) -> bool:
    """image_extractor.py:226-230: area strictly above minimal_area."""
    return score_image(url, width, height) > MINIMAL_AREA


def image_entropy(histogram: list[float]) -> float:
    """Shannon entropy of a histogram (image_extractor.py:51-57; takes
    the histogram itself since PIL isn't present to produce one)."""
    total = sum(histogram)
    if not total:
        return 0.0
    return -sum((h / total) * math.log(h / total, 2)
                for h in histogram if h)


def _gray_histogram(pixels) -> list[float]:
    """256-bin histogram of a 2-D uint8 array (numpy stand-in for
    PIL's Image.histogram on an L-mode image)."""
    import numpy as np

    return np.bincount(np.asarray(pixels, dtype=np.uint8).reshape(-1),
                       minlength=256).astype(float).tolist()


def square_image(pixels):
    """image_extractor.py:60-77 on a (h, w) uint8 array: while taller
    than wide, compare the entropy of the top and bottom <=10-px strips
    and crop away the LOWER-entropy one. Returns the square array."""
    import numpy as np

    img = np.asarray(pixels, dtype=np.uint8)
    y, x = img.shape
    while y > x:
        slice_height = min(y - x, 10)
        bottom = img[y - slice_height:y, :]
        top = img[:slice_height, :]
        if image_entropy(_gray_histogram(bottom)) < \
                image_entropy(_gray_histogram(top)):
            img = img[:y - slice_height, :]
        else:
            img = img[slice_height:, :]
        y, x = img.shape
    return img


def thumbnail_dims(width: int, height: int,
                   box: tuple[int, int] = THUMBNAIL_SIZE) -> tuple[int, int]:
    """PIL Image.thumbnail sizing math (shrink-only, aspect-preserving,
    round-half-even like PIL's rint) — prepare_image's second step
    (image_extractor.py:45-48)."""
    bw, bh = box
    if width <= bw and height <= bh:
        return width, height
    scale = min(bw / width, bh / height)
    return (max(1, int(round(width * scale))),
            max(1, int(round(height * scale))))
