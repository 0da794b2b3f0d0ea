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
