// swift-tools-version:5.5
// CozoSwift — SwiftPM wrapper over the cozo_tpu C ABI, the analog of
// the reference's cozo-lib-swift C-style shims.
import PackageDescription

let package = Package(
    name: "CozoSwift",
    products: [
        .library(name: "CozoSwift", targets: ["CozoSwift"])
    ],
    targets: [
        .systemLibrary(name: "CCozo", path: "Sources/CCozo"),
        .target(
            name: "CozoSwift",
            dependencies: ["CCozo"],
            path: "Sources/CozoSwift"
        ),
    ]
)
