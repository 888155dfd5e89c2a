"""Load the reference system's deterministic kernels as a pytest oracle.

The reference (/root/reference, read-only) imports third-party SDKs
(google-generativeai, json_repair, dotenv) at module import time and
hard-fails without GEMINI_API_KEY.  None of that is needed to *call* the
deterministic kernels (StructuralExtractor, EntityNormalizer,
RelationshipInferrer), so we stub the unused imports and set a dummy key
before importing.  Nothing from the reference is executed against any
network service.
"""
from __future__ import annotations

import os
import sys
import types

_REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def load_reference():
    """Import and return the reference kernel namespace (cached)."""
    os.environ.setdefault("GEMINI_API_KEY", "parity-test-dummy-key")

    _stub_module("dotenv", load_dotenv=lambda *a, **k: None)
    _stub_module("json_repair", repair_json=lambda s, **k: s)
    google = types.ModuleType("google")
    genai = types.ModuleType("google.generativeai")
    genai.configure = lambda **k: None
    genai.GenerativeModel = type("GenerativeModel", (), {"__init__": lambda self, *a, **k: None})
    google.generativeai = genai
    sys.modules.setdefault("google", google)
    sys.modules.setdefault("google.generativeai", genai)

    if _REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, _REFERENCE_ROOT)

    from src.core.extraction.structural_extractor import StructuralExtractor
    from src.core.extraction.extraction_pipeline import EntityNormalizer
    from src.core.extraction.semantic_extractor import (
        ExtractedEntity,
        ExtractedFact,
        ExtractedRelation,
        RelationshipInferrer,
    )

    return types.SimpleNamespace(
        StructuralExtractor=StructuralExtractor,
        EntityNormalizer=EntityNormalizer,
        RelationshipInferrer=RelationshipInferrer,
        ExtractedEntity=ExtractedEntity,
        ExtractedRelation=ExtractedRelation,
        ExtractedFact=ExtractedFact,
    )
