"""Engine error types.

Parity with the reference's error surface (semantics documented in
SURVEY.md §1.5): strict-mode duplicate insert and missing-id delete are
errors (reference: src/storage.rs:30-47); dimension mismatch at ingest is
an error (reference: vector_db/src/collection_manager.rs:147-152);
unknown collection is an error (collection_manager.rs:169-170).
"""


class KowariError(Exception):
    """Base class for engine errors."""


class DuplicateIdError(KowariError):
    """Strict-mode insert of an id that already exists."""


class MissingIdError(KowariError):
    """Strict-mode delete/get of an id that does not exist."""


class DimensionMismatchError(KowariError):
    """Embedding length does not match the collection dimension."""


class CollectionNotFoundError(KowariError):
    """Named collection does not exist in the catalog."""


class CommitConflictError(KowariError):
    """Optimistic-concurrency conflict: another writer committed a new
    table version between this operation's snapshot and its commit."""
