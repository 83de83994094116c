"""CLIF semantics layer (SURVEY.md §7 M2) — the reference bot's
capabilities (Common-Longitudinal-ICU-data-Format/clif-project-bot)
re-expressed as composable Spark DataFrame transforms:

    fixtures.py    the sites dimension + seeded CLIF-shaped test data
    metadata.py    multi-source project-metadata extraction (R1-R11)
    status_store.py dense status matrix + POC upserts (R13, R16-R21)
    dashboard.py   the status_table pivot + golden text renderer (R22)
    mcide.py       controlled-vocabulary catalog + guarded append (R23-R27)
    commands.py    command-log application (R28-R31, the app.py flow)
"""
