"""Reversible attribute evolution: record-level diff (change-set
extract), sealed change-set envelopes, and merge re-apply — the
deidentify-encrypt → decrypt-reidentify round trip.

Reference semantics (SURVEY.md §2.4 J4-J6, §2.8 C1-C4):

* **diff extract** — ``originalTags.getRemovedOrModified(deidentifiedTags)``
  computes the change set needed to restore the original record
  (``DeidentifyEncryptDICOM.java:406-444``). Engine: a row-aligned diff of
  two batch versions inside one ``map_batches`` → a ``_changeset`` column.
* **envelope** — CMS password envelope, AES + PBKDF2 with an iterations
  knob ("more … costs CPU cycles", ``DeidentifyEncryptDICOM.java:90-96``;
  ``util/Encryption.java:44-78``). Engine: PBKDF2-HMAC-SHA256 → AES-GCM
  with a *content-derived nonce* (SIV-style) so sealing is deterministic
  and replay produces byte-identical output (idempotence requirement).
* **key memo + conflict policy** — the stored expected keys are compared
  on decrypt; mismatch routes to ``not decrypted`` / reject, or is
  accepted as a new series preserving current keys
  (``DecryptReidentifyDICOM.java:170-188``).
* **merge apply (LWW)** — ``Attributes.update(UpdatePolicy.OVERWRITE)``
  re-applies the change set over the current record
  (``DecryptReidentifyDICOM.java:192-193``).
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

try:  # sandbox ships cryptography; stay import-safe anyway
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    HAVE_CRYPTO = True
except Exception:  # pragma: no cover
    AESGCM = None
    HAVE_CRYPTO = False

CHANGESET_COL = "_changeset"
ROUTE_NOT_DECRYPTED = "not_decrypted"


# ------------------------------------------------------------------ envelope
def _derive_key(password: str, iterations: int) -> bytes:
    """PBKDF2 key derivation; ``iterations`` is the per-record compute
    dial, default mirrors the reference's 100."""
    return hashlib.pbkdf2_hmac("sha256", password.encode(), b"raycdc-envelope", iterations)


def seal(payload: bytes, password: str, iterations: int = 100, _key: bytes | None = None) -> bytes:
    """Deterministic authenticated envelope: AES-256-GCM with a nonce
    derived from the payload (SIV-style). Identical payload+password →
    identical ciphertext, which keeps epoch outputs replay-stable.
    Batch callers pass a pre-derived ``_key`` so the (intentionally
    expensive) KDF runs once per call site, not once per row."""
    if not HAVE_CRYPTO:  # pragma: no cover
        raise NotImplementedError("cryptography library unavailable")
    key = _key if _key is not None else _derive_key(password, iterations)
    nonce = hashlib.sha256(b"nonce" + payload).digest()[:12]
    return nonce + AESGCM(key).encrypt(nonce, payload, None)


def unseal(blob: bytes, password: str, iterations: int = 100, _key: bytes | None = None) -> bytes | None:
    """Returns None when the password is wrong / blob corrupt (the
    'not decrypted' route), never raises for bad credentials."""
    if not HAVE_CRYPTO:  # pragma: no cover
        raise NotImplementedError("cryptography library unavailable")
    key = _key if _key is not None else _derive_key(password, iterations)
    try:
        return AESGCM(key).decrypt(blob[:12], blob[12:], None)
    except Exception:
        return None


# ------------------------------------------------------------------ diff
def _row_values(t: pa.Table) -> list[dict]:
    return t.to_pylist()


def compute_changeset(
    original: pa.Table,
    transformed: pa.Table,
    key: str = "doc_id",
    password: str | None = None,
    iterations: int = 100,
) -> pa.Table:
    """Row-aligned diff: for every row, record the original values of the
    columns the transform removed or modified (plus removed-column data),
    memo'ing the *transformed* key for the conflict check. Returns
    ``transformed`` + a ``_changeset`` binary column.

    ``original`` and ``transformed`` must be positionally aligned — they
    are two versions of the same batch, exactly like the reference's
    two parses of one record (``DeidentifyEncryptDICOM.java:214-231``).
    """
    if original.num_rows != transformed.num_rows:
        raise ValueError("changeset requires row-aligned tables")
    derived = _derive_key(password, iterations) if password else None  # KDF once per batch
    orig_rows = _row_values(original)
    new_rows = _row_values(transformed)
    blobs = []
    for o, n in zip(orig_rows, new_rows):
        changed = {c: o[c] for c in o if c not in n or n[c] != o[c]}
        patch = {"expect": {key: n.get(key)}, "restore": changed}
        raw = json.dumps(patch, sort_keys=True).encode()
        blobs.append(seal(raw, password, iterations, _key=derived) if password else raw)
    return transformed.append_column(CHANGESET_COL, pa.array(blobs, type=pa.binary()))


def apply_changeset(
    batch: pa.Table,
    key: str = "doc_id",
    password: str | None = None,
    iterations: int = 100,
    accept_new: bool = False,
) -> pa.Table:
    """Merge re-apply (LWW overwrite): restore original values from each
    row's change set. Adds a ``_route`` column:

    * restored rows → ``ok``
    * undecryptable / unparsable envelope → ``not_decrypted`` (unchanged)
    * key-memo mismatch (the record's key was changed since sealing) →
      ``not_decrypted`` unless ``accept_new``, which restores every
      column EXCEPT the key (accept-as-new-series,
      ``DecryptReidentifyDICOM.java:170-188``).
    """
    from raycdc.routing import ROUTE_COL, ROUTE_OK

    if batch.num_rows == 0:
        # from_pylist([]) would collapse the schema to zero columns and
        # break downstream unification on Ray's empty blocks
        keep = batch.drop_columns([CHANGESET_COL]) if CHANGESET_COL in batch.column_names else batch
        return keep.append_column("_route", pa.array([], type=pa.string()))

    derived = _derive_key(password, iterations) if password else None  # KDF once per batch
    rows = batch.to_pylist()
    out_rows = []
    routes = []
    for r in rows:
        blob = r.pop(CHANGESET_COL, None)
        if blob is None:
            routes.append(ROUTE_NOT_DECRYPTED)
            out_rows.append(r)
            continue
        raw = unseal(bytes(blob), password, iterations, _key=derived) if password else bytes(blob)
        if raw is None:
            routes.append(ROUTE_NOT_DECRYPTED)
            out_rows.append(r)
            continue
        try:
            patch = json.loads(raw)
        except Exception:
            routes.append(ROUTE_NOT_DECRYPTED)
            out_rows.append(r)
            continue
        expected = patch.get("expect", {}).get(key)
        mismatch = expected is not None and r.get(key) != expected
        if mismatch and not accept_new:
            routes.append(ROUTE_NOT_DECRYPTED)
            out_rows.append(r)
            continue
        restore = patch.get("restore", {})
        for c, v in restore.items():
            if mismatch and c == key:
                continue  # accept-as-new: preserve current key
            r[c] = v
        routes.append(ROUTE_OK)
        out_rows.append(r)
    out = pa.Table.from_pylist(out_rows)
    # column order / types can drift through pylist; keep the batch's
    # payload schema where names coincide
    for f in batch.schema:
        if f.name in out.column_names and f.name != CHANGESET_COL:
            i = out.column_names.index(f.name)
            if out.column(i).type != f.type:
                try:
                    out = out.set_column(i, f.name, out.column(i).cast(f.type))
                except pa.ArrowInvalid:
                    pass
    return out.append_column("_route", pa.array(routes))


class DeidentifyEncrypt:
    """Actor-pool stage for the forward path: rules + change-set seal.
    CPU-bound (PBKDF2 per batch of rows) → run as ``map_batches(cls,
    concurrency=N)`` with ``iterations`` as the compute dial."""

    def __init__(self, ruleset, key: str = "doc_id", password: str | None = None, iterations: int = 100):
        self.ruleset = ruleset
        self.key = key
        self.password = password
        self.iterations = iterations

    def __call__(self, batch: pa.Table) -> pa.Table:
        transformed = self.ruleset(batch)
        return compute_changeset(
            batch, transformed, key=self.key, password=self.password, iterations=self.iterations
        )


class DecryptReidentify:
    """Actor-pool stage for the reverse path."""

    def __init__(self, key: str = "doc_id", password: str | None = None, iterations: int = 100, accept_new: bool = False):
        self.key = key
        self.password = password
        self.iterations = iterations
        self.accept_new = accept_new

    def __call__(self, batch: pa.Table) -> pa.Table:
        return apply_changeset(
            batch, key=self.key, password=self.password, iterations=self.iterations, accept_new=self.accept_new
        )
