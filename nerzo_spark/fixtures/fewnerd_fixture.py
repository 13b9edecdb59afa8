"""FewNERD-format micro-fixture (FIXTURES.md §6) + independent gold oracle.

The token file exercises every branch of the reference state machine:
adjacent same-tag runs, entity at document start / end, punctuation-adjacent
entities (no-space chars, step_process_to_document.py:42-43), type-to-type
transitions, and multi-word phrases.

``gold_mentions`` computes expected spans with a direct sequential
re-statement of the reference semantics (step_process_to_document.py:39-105)
— an independent oracle for the declarative Spark plan in sources/fewnerd.py.
"""

from __future__ import annotations

import hashlib

NO_SPACE = ["(", ")", "[", "]", "{", "}", ":", ";", ",", ".", "!", "?", "'",
            '"', "`", "'s", "''", "%"]

#: list of documents; each document is a list of (word, tag)
DOCS: list[list[tuple[str, str]]] = [
    # entity at start, multi-word, trailing punctuation (no-space)
    [
        ("Barack", "person-politician"),
        ("Obama", "person-politician"),
        ("visited", "O"),
        ("Berlin", "location-city"),
        (".", "O"),
    ],
    # adjacent same-tag runs merge into ONE span (in_entity branch)
    [
        ("the", "O"),
        ("European", "organization-union"),
        ("Central", "organization-union"),
        ("Bank", "organization-union"),
        ("in", "O"),
        ("Frankfurt", "location-city"),
    ],
    # entity at end of document; type-to-type direct transition
    [
        ("read", "O"),
        ("War", "art-book"),
        ("and", "art-book"),
        ("Peace", "art-book"),
        ("Tolstoy", "person-writer"),
    ],
    # punctuation inside: parenthesis + quotes around entity
    [
        ("see", "O"),
        ("(", "O"),
        ("NASA", "organization-agency"),
        (")", "O"),
        ("and", "O"),
        ("'", "O"),
        ("Vostok", "product-spacecraft"),
        ("'", "O"),
    ],
    # possessive 's (no-space word) adjacent to an entity
    [
        ("Newton", "person-scientist"),
        ("'s", "O"),
        ("laws", "O"),
    ],
]


def token_file_text() -> str:
    blocks = ["\n".join(f"{w}\t{t}" for w, t in doc) for doc in DOCS]
    return "\n\n".join(blocks) + "\n"


def _space(prev_word: str | None, word: str) -> str:
    if not prev_word or not word or word in NO_SPACE:
        return ""
    return " "


def gold_mentions() -> list[dict]:
    """Sequential oracle for the span state machine (independent of Spark)."""
    out = []
    for doc_seq, doc in enumerate(DOCS):
        full = ""
        prev_word: str | None = None
        prev_tag: str | None = None
        spans: list[dict] = []
        for word, tag in doc:
            addition = _space(prev_word, word) + word
            starting = tag != "O" and tag != prev_tag
            inside = tag != "O" and tag == prev_tag
            if starting:
                coarse, fine = tag.split("-")
                spans.append(
                    {
                        "coarse_type": coarse,
                        "fine_type": fine,
                        "index_start": len(full) + (len(addition) - len(word)),
                        "index_end": len(full) + len(addition),
                    }
                )
            elif inside:
                spans[-1]["index_end"] += len(addition)
            full += addition
            prev_word, prev_tag = word, tag
        for s in spans:
            s["phrase"] = full[s["index_start"]:s["index_end"]]
            s["all_text"] = full
            s["doc_seq"] = doc_seq
            s["text_id"] = hashlib.sha1(full.encode()).hexdigest()
            out.append(s)
    return out
