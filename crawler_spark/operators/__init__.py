"""Frontier / content / discovery operators as DataFrame programs."""
