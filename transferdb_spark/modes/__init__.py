"""Task modes — the reference's 8-mode surface (server/server.go:28-82).

prepare / assess / reverse / check / compare / csv / full / all,
each a thin driver over the operator library.
"""
