"""Persistent on-disk cache of compiled XLA executables (TPU).

The remote-compile tunnel bypasses jax's persistent compilation cache, so
every fresh process used to re-pay each signature's full compile (~6-10 s
for small XLA programs, 190-260 s for global-BA programs with Mosaic
kernels — measured 2026-08-21: the SAME signature cost 263 s and 261 s in
two consecutive fresh processes). jax.experimental.serialize_executable
round-trips the compiled executable through bytes, and deserialize_and_load
takes ~0.1 s — so this module keys executables by (jit signature, source
hash, jax/runtime version) and persists them under PYCOLMAP_TPU_CACHE_DIR.

This is the TPU-native analog of the reference simply being a precompiled
C++ binary: COLMAP pays its compile at build time, we pay per signature
once per machine.

CPU backends are excluded: XLA:CPU executable serialization SIGABRTs after
many large compiles (see git 15f1602), and CPU compiles are fast anyway.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading

_memo: dict = {}
_lock = threading.Lock()
_disabled = os.environ.get("PYCOLMAP_TPU_AOT_CACHE", "1") == "0"


def _cache_dir():
    base = os.environ.get(
        "PYCOLMAP_TPU_CACHE_DIR",
        os.path.expanduser("~/.cache/pycolmap_tpu_jax"),
    )
    return os.path.join(base, "aot_exec")


def _backend_fingerprint():
    import jax

    try:
        backend = jax.extend.backend.get_backend()
        version = getattr(backend, "platform_version", "")
    except Exception:
        version = ""
    dev = jax.devices()[0]
    return (jax.__version__, dev.platform, dev.device_kind, version,
            len(jax.devices()))


_src_hash_memo: dict = {}


def source_salt(*modules) -> str:
    """Hash of the given modules' source files — auto-invalidates cached
    executables when the code that built them changes."""
    key = tuple(m.__name__ for m in modules)
    hit = _src_hash_memo.get(key)
    if hit is not None:
        return hit
    h = hashlib.blake2b(digest_size=12)
    for m in modules:
        try:
            with open(m.__file__, "rb") as f:
                h.update(f.read())
        except (OSError, AttributeError):
            h.update(m.__name__.encode())
    salt = h.hexdigest()
    _src_hash_memo[key] = salt
    return salt


def enabled() -> bool:
    if _disabled:
        return False
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _key_digest(tag, sig) -> str:
    h = hashlib.blake2b(digest_size=20)
    h.update(repr((tag, sig, _backend_fingerprint())).encode())
    return h.hexdigest()


def get(tag: str, sig) -> "object | None":
    """Loaded executable for (tag, sig), from memory or disk; else None."""
    if not enabled():
        return None
    digest = _key_digest(tag, sig)
    with _lock:
        if digest in _memo:
            return _memo[digest]
    path = os.path.join(_cache_dir(), digest + ".pkl")
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        exe = se.deserialize_and_load(payload, in_tree, out_tree)
    except Exception:
        try:
            os.remove(path)  # corrupt/stale entry
        except OSError:
            pass
        return None
    with _lock:
        _memo[digest] = exe
    return exe


def put(tag: str, sig, compiled) -> None:
    """Persist a jax Compiled; also memoize for this process."""
    if not enabled():
        return
    digest = _key_digest(tag, sig)
    with _lock:
        _memo[digest] = compiled
    try:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        d = _cache_dir()
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp.{os.getpid()}.{digest}")
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, os.path.join(d, digest + ".pkl"))
    except Exception:
        pass  # cache is best-effort; never fail the solve


def memo_get(tag: str, sig):
    """In-process-only lookup (no disk) — for hot dispatch paths."""
    if _disabled:
        return None
    with _lock:
        return _memo.get(_key_digest(tag, sig))


def _avals(tree):
    import jax

    return jax.tree.map(
        lambda x: (
            tuple(getattr(x, "shape", ())),
            str(getattr(x, "dtype", type(x).__name__)),
        ),
        tree,
    )


def cached_call(jf, tag: str, salt: str, statics: dict, *args, **kwargs):
    """Dispatch a jitted call through the persistent executable cache.

    jf: a jax.jit-wrapped function whose static parameters are KEYWORD
    arguments given in `statics`; args/kwargs are the dynamic operands.
    On a cache hit the stored executable runs directly (no trace, no
    compile); on a miss the normal jit call runs and its executable is
    persisted (lower().compile() after the call is an in-memory hit, ~ms).
    """
    if not enabled():
        return jf(*args, **kwargs, **statics)
    sig = (tag, tuple(sorted(statics.items())), repr(_avals((args, kwargs))),
           salt)
    exe = get(tag, sig)
    if exe is not None:
        return exe(*args, **kwargs)
    out = jf(*args, **kwargs, **statics)
    try:
        put(tag, sig, jf.lower(*args, **kwargs, **statics).compile())
    except Exception:
        pass
    return out
