from mismo_ray.pipelines._rldata import rldata_match_pairs
from mismo_ray.pipelines._webpages import (
    add_extracted_text,
    extract_text_bytes,
    featurize,
    flagship,
    load_pages,
    render_html,
    run_er_pipeline,
    synth_pages,
    webpage_comparers,
)

__all__ = [
    "rldata_match_pairs",
    "add_extracted_text",
    "extract_text_bytes",
    "featurize",
    "flagship",
    "load_pages",
    "render_html",
    "run_er_pipeline",
    "synth_pages",
    "webpage_comparers",
]
