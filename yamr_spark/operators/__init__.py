"""Named DataFrame operators — the engine's public query surface.

Each module covers one slice of SURVEY.md §2 / §7:

- ``wordcount``   — the reference's flagship job (C1–C5, F1–F5)
- ``keyvalue``    — generic (key, value) shuffle/group/agg ops (C2–C6)
- ``relational``  — joins/windows/top-k/set-ops the reference lacks (§2.4)
- ``dedup``       — exact + MinHash/SimHash/Jaccard/embedding near-dup
- ``similarity``  — brute-force and LSH-bucketed ANN over embeddings
- ``text``        — language-id, quality, token counts, fingerprints
- ``multimodal``  — binary payload plumbing with stubbed decoders
"""
