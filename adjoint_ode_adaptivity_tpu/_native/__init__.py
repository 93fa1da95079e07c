"""Holds the compiled native revolve planner when installed via pip
(setup.py builds ``native/revolve.cpp`` into ``librevolve*.so`` here;
``adjoint.checkpointing`` loads it with ctypes and falls back to the
byte-identical pure-Python planner when absent)."""
