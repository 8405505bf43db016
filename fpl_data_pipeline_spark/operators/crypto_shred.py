"""Crypto-shredding: per-subject encryption so GDPR erasure = key deletion.

`gdpr_erasure_audit` (functions/quality.py) sizes the rewrite-vs-tombstone
cost of physically deleting a subject from an immutable lake.  This module
implements the third industry answer: encrypt every subject-owned value with
a PER-SUBJECT key at ingest; "erasure" is then deleting one row from the
(small) keystore — the parquet files never need rewriting, and the orphaned
ciphertext is cryptographically unreadable.  This is the standard
lakehouse/Kafka pattern for right-to-be-forgotten at 100 TB, where
rewriting every file containing one user is the thing you cannot afford.

Spark-side mechanics: `aes_encrypt`/`aes_decrypt` are JVM builtins
(codegen'd, no Python), the keystore is a per-subject relation joined
broadcast (it has one row per subject, not per fact row), and decryption of
a shredded subject yields NULL via `try_aes_decrypt` + the left join — reads
keep working, erased subjects just vanish into NULLs.

No DuckDB oracle: AES-GCM ciphertext is nonce-randomized by design (the same
plaintext encrypts differently every call), so value equality is the wrong
contract — the operator is proven by pytest laws instead
(tests/test_operators.py): decrypt∘encrypt == identity, shredding exactly
one subject NULLs exactly that subject's values, and ciphertext is not the
plaintext.  Not registered as a driver query for the same reason.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

KEY_BYTES = 16  # AES-128


def derive_keystore(subjects: DataFrame, subject_col: str, secret: str) -> DataFrame:
    """One key row per subject: (subject, key).  Keys are derived
    deterministically from a master secret here so tests are reproducible;
    a production keystore would hold random keys from a KMS — the contract
    downstream is only (subject -> 16-byte key)."""
    return subjects.select(subject_col).distinct().select(
        subject_col,
        F.substring(
            F.md5(F.concat(F.lit(secret), F.lit(":"), F.col(subject_col).cast("string"))),
            1,
            KEY_BYTES,
        )
        .cast("binary")
        .alias("subject_key"),
    )


def encrypt_subject_column(
    df: DataFrame, subject_col: str, value_col: str, keystore: DataFrame
) -> DataFrame:
    """Replace ``value_col`` with its AES-GCM ciphertext under the owning
    subject's key.  The keystore is broadcast (per-subject cardinality);
    the fact table is never shuffled."""
    out = df.join(F.broadcast(keystore), subject_col, "inner").withColumn(
        value_col,
        F.aes_encrypt(F.col(value_col).cast("binary"), F.col("subject_key")),
    )
    return out.drop("subject_key")


def decrypt_subject_column(
    df: DataFrame, subject_col: str, value_col: str, keystore: DataFrame
) -> DataFrame:
    """Decrypt ``value_col`` back to a string; subjects whose key has been
    shredded (absent from the keystore) decrypt to NULL — the left join +
    try_aes_decrypt make erased data unreadable without touching the fact
    files."""
    out = df.join(F.broadcast(keystore), subject_col, "left").withColumn(
        value_col,
        F.try_aes_decrypt(F.col(value_col), F.col("subject_key")).cast("string"),
    )
    return out.drop("subject_key")


def shred_subjects(keystore: DataFrame, subject_col: str, subjects: list) -> DataFrame:
    """Erasure: remove the listed subjects' keys.  O(|keystore|), no fact
    rewrite."""
    return keystore.filter(~F.col(subject_col).isin(subjects))
