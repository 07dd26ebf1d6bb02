// Companion no-op to pybind11.h (see that header).
#pragma once
