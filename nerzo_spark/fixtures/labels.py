"""Label/type catalog fixture — the broadcast dimension table of the linker.

Mirrors the reference taxonomy structure (coarse types at
/root/reference/clearml_pipelines/fewnerd_pipeline/step_generate_ne_embedding.py:100-101,
fine-type lists at /root/reference/contrastive/fewnerd_processor.py:90-101)
with a code-flavored taxonomy of the same shape, per FIXTURES.md §2.

Prompt templates follow /root/reference/entity_classifier.py:1-9.
"""

from __future__ import annotations

import hashlib

#: (coarse_type, fine_type)
TAXONOMY: list[tuple[str, str]] = [
    ("symbol", "function"),
    ("symbol", "class"),
    ("symbol", "constant"),
    ("module", "import"),
    ("credentialish", "email"),
    ("url", "http_url"),
    ("net", "ipv4"),
    ("version", "semver"),
]

FINE_TO_COARSE: dict[str, str] = {f: c for c, f in TAXONOMY}


def label_id(coarse_type: str, fine_type: str) -> str:
    """``fnd_``-style sha1 id (scheme: step_index_to_database.py:36-39)."""
    h = hashlib.sha1(f"label|{coarse_type}|{fine_type}".encode()).hexdigest()
    return f"fnd_{h}"


def extraction_template(fine_type: str) -> str:
    """entity_classifier.py:7-9 with underscore->space."""
    t = fine_type.replace("_", " ")
    return (
        f"In the following sentence, write in a list the words or word phrases "
        f"that represent a {t}: {{sentence}}\n if there are no words or word "
        f"phrases that represent a {t} please write 'none'."
    )


def label_rows() -> list[dict]:
    return [
        {
            "label_id": label_id(c, f),
            "coarse_type": c,
            "fine_type": f,
            "template": extraction_template(f),
        }
        for c, f in TAXONOMY
    ]
