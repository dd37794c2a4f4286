"""Independent reference-replay oracle (shares NO code with puppax/).

A literal transcription of the reference environment driving the MuJoCo C
engine, used to certify seed-0 obs/reward parity (VERDICT r1 item 1).
"""
