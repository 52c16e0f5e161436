"""Runtime configuration for the hotproofs_tpu stack.

Centralises platform/caching knobs (the reference has no config system —
SURVEY.md §5; paths and engines are hardcoded, main.rs:29-30). Import-order
matters for some settings; call setup_jax() before heavy jax use.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


@dataclass
class Config:
    platform: str = os.environ.get("HOTPROOFS_PLATFORM", "")  # "" = default
    cache_dir: str = os.environ.get(
        "HOTPROOFS_CACHE", os.path.join(_REPO_ROOT, ".cache"))
    compile_cache: bool = os.environ.get("HOTPROOFS_COMPILE_CACHE", "1") == "1"
    curve: str = os.environ.get("HOTPROOFS_CURVE", "pallas")
    log_level: str = os.environ.get("HOTPROOFS_LOG", "info")
    # Fused pallas MSM in the fold hot path: "auto" = on when the backend is
    # a real TPU (measured 20x the XLA sort-free MSM on a v5e), "1" force-on
    # (CPU interpret mode — slow, test-only), "0" force-off.
    pallas_msm: str = os.environ.get("HOTPROOFS_PALLAS_MSM", "auto")
    # Transcript Poseidon parameterisation: "default" (t=3, R_F=8, R_P=57)
    # or "neptune" (neptune 13.0.0 round numbers, (8, 55) at 255 bits —
    # ops/poseidon.py neptune_round_numbers). Prover and verifier must agree;
    # the exported vk records the chosen (t, R_F, R_P).
    poseidon: str = os.environ.get("HOTPROOFS_POSEIDON", "default")


CONFIG = Config()


def pallas_msm_enabled() -> bool:
    """Should provers use the fused pallas MSM (ops/msm_pallas.py)?"""
    if CONFIG.pallas_msm == "1":
        return True
    if CONFIG.pallas_msm == "0":
        return False
    import jax
    return jax.default_backend() == "tpu"


def _host_tag() -> str:
    """Short fingerprint of this host's CPU feature set."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                feats = "unknown"
    except OSError:
        feats = "unknown"
    return hashlib.sha256(feats.encode()).hexdigest()[:10]


def setup_jax(platform: str | None = None) -> None:
    """Apply platform + persistent-compile-cache settings.

    NOTE: in this environment a sitecustomize pins jax_platforms to the TPU
    plugin; jax.config.update (not the env var) is the effective override."""
    import jax

    plat = platform or CONFIG.platform
    if plat:
        jax.config.update("jax_platforms", plat)
    if CONFIG.compile_cache:
        # Host-fingerprinted cache dir: XLA:CPU AOT executables are
        # machine-feature specific, and loading an entry compiled on a
        # different host is not just rejected-with-a-warning — it can
        # SIGSEGV inside cache deserialization (observed in this
        # environment). Never share cache entries across host types.
        cache = os.path.join(CONFIG.cache_dir, f"xla-{_host_tag()}")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
