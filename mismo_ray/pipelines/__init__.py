from mismo_ray.pipelines._febrl import febrl_comparers, febrl_match_pairs
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
    "febrl_comparers",
    "febrl_match_pairs",
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
