// Minimal stand-in for bond::blob — only referenced by the reference's
// Index.h declarations (never instantiated by Processor.cpp).
#pragma once
namespace bond {
class blob {};
}
