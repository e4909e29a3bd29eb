"""Native runtime bindings (C++ via ctypes) — fast I/O and the
discrete-event performance model backend."""
