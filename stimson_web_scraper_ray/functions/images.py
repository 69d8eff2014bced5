"""Top-image selection (O4 in SURVEY.md §2.6).

The reference fetches every candidate image over the network and picks the
largest by area, dividing sprite/logo candidates' area by 10 and filtering
by aspect ratio and minimum size (image_extractor.py:183-224). There is no
network here, so the *selection algebra* is implemented as a pure function
over (url, width, height) rows — the dims come from the multimodal decode
stage (pipelines/multimodal.py) or a metadata sidecar at scale.
"""

from __future__ import annotations

MIN_WIDTH = 50          # image_extractor.py: minimum size gate
MAX_RATIO = 4.0         # skip banner-shaped images
SPRITE_PENALTY = 10.0   # image_extractor.py:214-ish: sprite/logo area ÷ 10


def _is_sprite_or_logo(url: str) -> bool:
    low = (url or "").lower()
    return "sprite" in low or "logo" in low


def score_image(url: str, width: int, height: int) -> float:
    """Area-based score with the reference's penalties; 0 = rejected."""
    if not url or width < MIN_WIDTH or height <= 0:
        return 0.0
    ratio = width / height
    if ratio > MAX_RATIO or ratio < 1.0 / MAX_RATIO:
        return 0.0
    area = float(width * height)
    if _is_sprite_or_logo(url):
        area /= SPRITE_PENALTY
    return area


def select_top_image(candidates: list[tuple[str, int, int]]) -> str:
    """candidates = [(url, width, height)] in page order → best url or ''.
    Deterministic ties: first in page order wins (reference iterates in
    order and keeps the strict maximum)."""
    best_url, best_score = "", 0.0
    for url, w, h in candidates:
        s = score_image(url, w, h)
        if s > best_score:
            best_url, best_score = url, s
    return best_url
