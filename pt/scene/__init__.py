"""Scene layer: data model, builder, graph, flattening, importers, examples.
Counterpart of the reference's L4 scene layer (Scene/SceneGraph/SceneManager/
SceneImporter/TextureImporter/ExampleScenes)."""

from pt.scene.builder import Scene, SceneBuilder, VertexArrays
from pt.scene.flatten import DeviceScene, flatten_scene, world_vertices
from pt.scene.types import (DirectionalLight, Geometry, MaterialType, MeshInfo,
                            MetallicRoughnessMaterial, Model, ModelInstance,
                            PhongMaterial, PointLight, Skybox, SkyboxKind,
                            SpecularGlossinessMaterial, TextureInfo,
                            TextureType, create_material_id,
                            unpack_material_id)
