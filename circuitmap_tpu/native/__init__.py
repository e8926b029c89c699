"""Native (C++) runtime components, built on demand via utils.native."""
