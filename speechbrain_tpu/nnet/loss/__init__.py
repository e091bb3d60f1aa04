"""Specialised losses: transducer, guided attention, STOI."""
