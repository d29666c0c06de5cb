"""Wallet-derivation transforms: Electrum, MultiBit HD, Armory, Bitimage.

String/blob-input transforms over the host wallet cores; key batches then
flow through the shared device derive+match program like any other
transform.  Labels mirror the reference wrappers:
  electrum: "truncated_seed[chain/i]"  (transform/electrum.rs:61-64)
  multibit: "truncated_mnemonic[m/0'/0/i]" (transform/multibit.rs:53)
  armory:   plain input string (transform/armory.rs:89-102)
  bitimage: "label[path]" / "label:passphrase[path]" (transform/bitimage.rs)
"""

from __future__ import annotations

import numpy as np

from .registry import TransformSpec
from .strings import StringTransform


def electrum_spec(for_change: bool = False, derivation_count: int = 20,
                  device_stretch_threshold: int = 32) -> TransformSpec:
    from ..wallets.electrum import (ElectrumDeriver, ElectrumError,
                                    master_pubkeys_device, stretch_keys_device,
                                    truncate_seed)
    chain = "1" if for_change else "0"
    name = "electrum:change" if for_change else "electrum"
    slots = [f"[{chain}/{i}]" for i in range(derivation_count)]

    def _derivers(strings):
        """Build per-seed derivers; large uniform batches stretch on device
        (the 100k-iteration loop is the dominant cost, SURVEY.md §7.7)."""
        is_hex = [bool(s) and all(c in "0123456789abcdefABCDEF" for c in s)
                  for s in strings]
        derivers = [None] * len(strings)
        hex_idx = [i for i, ok in enumerate(is_hex) if ok]
        by_len = {}
        for i in hex_idx:
            by_len.setdefault(len(strings[i]), []).append(i)
        for slen, idxs in by_len.items():
            if len(idxs) >= device_stretch_threshold:
                stretched = stretch_keys_device([strings[i].encode() for i in idxs])
                pubkeys = master_pubkeys_device(stretched)
                for i, st, pk in zip(idxs, stretched, pubkeys):
                    if pk is None:
                        continue   # invalid stretched scalar
                    derivers[i] = ElectrumDeriver(st, for_change, pubkey_bytes=pk)
            else:
                for i in idxs:
                    try:
                        derivers[i] = ElectrumDeriver.from_hex_seed(strings[i], for_change)
                    except ElectrumError:
                        pass
        return derivers

    def fn(strings):
        out = np.zeros((len(strings), derivation_count, 8), dtype=np.uint32)
        valid = np.zeros((len(strings), derivation_count), dtype=bool)
        for i, d in enumerate(_derivers(strings)):
            if d is None:
                continue
            for j, key in enumerate(d.derive_keys(derivation_count)):
                out[i, j] = np.frombuffer(key, dtype=">u4")
                valid[i, j] = True
        fn.last_valid = valid
        return out

    st = StringTransform(name, slots, fn, valid_fn=lambda strings: fn.last_valid)
    st.label_fn = truncate_seed
    return TransformSpec(name, None, st)


def multibit_spec(derivation_count: int = 20) -> TransformSpec:
    from ..wallets.multibit import MultibitBugDeriver, MultibitError, truncate_mnemonic
    slots = [f"[m/0'/0/{i}]" for i in range(derivation_count)]

    def fn(strings):
        out = np.zeros((len(strings), derivation_count, 8), dtype=np.uint32)
        valid = np.zeros((len(strings), derivation_count), dtype=bool)
        for i, s in enumerate(strings):
            try:
                d = MultibitBugDeriver(s, "")
            except MultibitError:
                continue
            for j, key in enumerate(d.derive_keys(derivation_count)):
                out[i, j] = np.frombuffer(key, dtype=">u4")
                valid[i, j] = True
        fn.last_valid = valid
        return out

    st = StringTransform("multibit", slots, fn, valid_fn=lambda strings: fn.last_valid)
    st.label_fn = truncate_mnemonic
    return TransformSpec("multibit", None, st)


def armory_spec() -> TransformSpec:
    """Two slots per numeric input (string-hash seed + BE-bytes seed), one
    for plain strings (transform/armory.rs:89-103)."""
    import hashlib
    from ..wallets.armory import armory_key

    def _string_fn(strings):
        out = np.zeros((len(strings), 1, 8), dtype=np.uint32)
        valid = np.zeros((len(strings), 1), dtype=bool)
        for i, s in enumerate(strings):
            seed = hashlib.sha256(s.encode()).digest()
            key = armory_key(seed)
            if key is not None:
                out[i, 0] = np.frombuffer(key, dtype=">u4")
                valid[i, 0] = True
        _string_fn.last_valid = valid
        return out

    st = StringTransform("armory", [""], _string_fn,
                         valid_fn=lambda strings: _string_fn.last_valid)

    # numeric path: host fallback via NumericHostTransform-style adapter
    from .numeric import NumericTransform
    from .._lazy import jnp

    def numeric_fn(hi, lo):
        # host roundtrip: armory needs EC math per input; done via callback
        # on small batches only (armory over huge ranges is impractical in
        # the reference too — each input costs 4 EC multiplications).
        import numpy as _np
        h = _np.asarray(hi)
        l = _np.asarray(lo)
        n = h.shape[0]
        keys = _np.zeros((n, 2, 8), dtype=_np.uint32)
        valid = _np.zeros((n, 2), dtype=bool)
        for i in range(n):
            v = (int(h[i]) << 32) | int(l[i])
            seed_s = hashlib.sha256(str(v).encode()).digest()
            k1 = armory_key(seed_s)
            if k1 is not None:
                keys[i, 0] = _np.frombuffer(k1, dtype=">u4")
                valid[i, 0] = True
            raw = b"\x00" * 24 + v.to_bytes(8, "big")
            k2 = armory_key(raw)
            if k2 is not None:
                keys[i, 1] = _np.frombuffer(k2, dtype=">u4")
                valid[i, 1] = True
        return jnp.asarray(keys), jnp.asarray(valid)

    nt = NumericTransform("armory", ["", ""], numeric_fn)
    nt.host_only = True
    return TransformSpec("armory", nt, st)


def bitimage_spec(path: str = "m/84'/0'/0'/0/0", passphrase: str = "",
                  passphrase_wordlist=None, derive_count: int = 1) -> TransformSpec:
    from ..wallets.bitimage import BitimageDeriver, increment_path_index

    passphrases = [passphrase]
    if passphrase_wordlist:
        with open(passphrase_wordlist) as f:
            passphrases = [w.strip() for w in f if w.strip()]

    paths = [path]
    for _ in range(derive_count - 1):
        paths.append(increment_path_index(paths[-1]))

    slots = []
    for pp in passphrases:
        for p in paths:
            slots.append(f"[{p}]" if not pp else f":{pp}[{p}]")

    def blob_fn(blobs):
        """blobs: list of (data, label) -> (N, S, 8) keys."""
        out = np.zeros((len(blobs), len(slots), 8), dtype=np.uint32)
        valid = np.zeros((len(blobs), len(slots)), dtype=bool)
        for i, (data, _label) in enumerate(blobs):
            s = 0
            for pp in passphrases:
                d = BitimageDeriver(data, pp)
                for p in paths:
                    try:
                        key = d.derive_path(p)
                        out[i, s] = np.frombuffer(key, dtype=">u4")
                        valid[i, s] = True
                    except ValueError:
                        pass
                    s += 1
        blob_fn.last_valid = valid
        return out

    def fn(strings):
        # string inputs are treated as raw bytes (file-less operation)
        return blob_fn([(s.encode(), s) for s in strings])

    st = StringTransform("bitimage", slots, fn,
                         valid_fn=lambda strings: blob_fn.last_valid)
    st.blob_fn = blob_fn
    return TransformSpec("bitimage", None, st)
