"""Pure, stateless scalar/vector functions shared by all stages.

Everything here is deterministic, has no Ray dependency, and is safe to
call on both the index-build side and the lookup side of a join (the
reference requires the canonicalizer to be byte-identical on both sides,
see AggressiveUrlCanonicalizer usage at
deduplicator-indexer/.../IndexBuilder.java:57 and
deduplicator-heritrix/.../DeDuplicator.java:120).
"""
